"""Differential filtered-read conformance: read_table_filtered vs DuckDB
over pyarrow-written files spanning logical types (decimal, date, uint64
beyond int64, nullable), writer versions, page-index presence, multi
row-group layouts, and the full predicate algebra (conjunctions, in,
is_null, Or/Not/And trees). Every row count must match SQL semantics."""

import decimal
import itertools

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc import predicate as P
from rayenc.parquet_read_enc import read_table_filtered

N = 5000
RNG = np.random.default_rng(7)
U64 = RNG.integers(0, 2**63, N, dtype=np.uint64) * 2
BIG = int(U64[17])

TABLE = pa.table({
    "i32": pa.array(RNG.integers(-1000, 1000, N), pa.int32()),
    "i64": pa.array(np.sort(RNG.integers(0, 10**9, N)), pa.int64()),
    "f64": pa.array(RNG.normal(size=N)),
    "s": pa.array([f"key{v:03d}" for v in RNG.integers(0, 50, N)]),
    "b": pa.array(RNG.integers(0, 2, N).astype(bool)),
    "d": pa.array(RNG.integers(0, 20000, N).astype("int32"), pa.date32()),
    "dec": pa.array(
        [decimal.Decimal(int(x)) / 100 for x in RNG.integers(7000, 13000, N)],
        pa.decimal128(10, 2),
    ),
    "u64": pa.array(U64, pa.uint64()),
    "opt": pa.array(
        [None if v % 7 == 0 else int(v) for v in RNG.integers(0, 100, N)],
        pa.int64(),
    ),
})

PREDS = [
    ([("i32", ">", 500)], "i32 > 500"),
    ([("s", "==", "key007")], "s = 'key007'"),
    ([("s", "in", ["key001", "key049", "nope"])],
     "s in ('key001','key049','nope')"),
    ([("dec", ">=", decimal.Decimal("110"))], "dec >= 110"),
    ([("u64", ">", 2**63)], "u64 > 9223372036854775808"),
    ([("u64", "in", [BIG, 3])], f"u64 in ({BIG}, 3)"),
    ([("opt", "is_null", None)], "opt is null"),
    ([("opt", "not_null", None), ("i32", "<", 0)],
     "opt is not null and i32 < 0"),
    (P.Or([P.Eq("s", "key001"), P.Eq("s", "key002")]),
     "s = 'key001' or s = 'key002'"),
    (P.Not(P.Gt("i32", 0)), "not (i32 > 0)"),
    (P.And(P.Or(P.Gt("f64", 1.0), P.Lt("f64", -1.0)), P.Eq("b", True)),
     "(f64 > 1.0 or f64 < -1.0) and b"),
]

# one modern multi-row-group file with page indexes, one legacy v1 file
# without stored Arrow schema, one compressed single-group file
CONFIGS = [
    ("2.6", "zstd", True, 7),
    ("1.0", "none", False, 7),
    ("2.6", "snappy", False, 1),
]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("diff")
    out = []
    for ver, comp, store, rgs in CONFIGS:
        p = str(d / f"t_{ver}_{comp}_{store}_{rgs}.parquet")
        pq.write_table(
            TABLE, p, version=ver, compression=comp, store_schema=store,
            row_group_size=N // rgs, write_page_index=True,
            use_dictionary=["s"], data_page_size=4096,
        )
        out.append(p)
    return out


@pytest.mark.parametrize("pi", range(len(PREDS)), ids=[w for _, w in PREDS])
def test_filtered_read_matches_duckdb(files, pi):
    pred, where = PREDS[pi]
    for path in files:
        got = read_table_filtered(path, pred)
        want = duckdb.sql(
            f"select count(*) from read_parquet('{path}') where {where}"
        ).fetchone()[0]
        assert got.num_rows == want, (path, where)
        # values, not just counts: the i64 column is unique per row, so a
        # sorted compare against pyarrow's own filtered read pins the rows
        expect = pq.read_table(path).filter(
            pa.compute.is_in(
                pq.read_table(path, columns=["i64"]).column("i64"),
                value_set=got.column("i64").combine_chunks(),
            )
        )
        assert got.sort_by("i64").cast(expect.schema).equals(
            expect.sort_by("i64")
        ), (path, where)


@pytest.mark.parametrize("seed", range(6))
def test_random_predicate_trees_match_duckdb(tmp_path, seed):
    # bounded randomized campaign: random tables x random And/Or/Not trees
    # over nullable strings + floats (NaN-free: NaN Not-semantics follow the
    # reference's IEEE comparisons, documented in rayenc.predicate) must
    # match DuckDB row counts
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(50, 4000))
    t = pa.table({
        "i": pa.array(rng.integers(-10**6, 10**6, n), pa.int64()),
        "f": pa.array(rng.normal(0, 100, n)),
        "s": pa.array([f"k{v:04d}" if v % 11 else None
                       for v in rng.integers(0, 200, n)]),
    })
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path, row_group_size=max(10, n // 5),
                   write_page_index=True, data_page_size=2048)
    iv = int(rng.integers(-10**6, 10**6))
    fv = float(rng.normal(0, 100))
    sv = f"k{int(rng.integers(0, 200)):04d}"
    leaves = [
        (P.Gt("i", iv), f"i > {iv}"),
        (P.LtEq("f", fv), f"f <= {fv}"),
        (P.Eq("s", sv), f"s = '{sv}'"),
        (P.IsNull("s"), "s is null"),
        (P.NotIn("s", [sv, "k0001"]), f"s not in ('{sv}', 'k0001')"),
    ]
    for shape in ("and", "or", "notand", "notor"):
        sel = rng.choice(len(leaves), 3, replace=False)
        preds = [leaves[i] for i in sel]
        body = [p for p, _ in preds]
        ws = [f"({w})" for _, w in preds]
        if shape == "and":
            tree, where = P.And(body), " and ".join(ws)
        elif shape == "or":
            tree, where = P.Or(body), " or ".join(ws)
        elif shape == "notand":
            tree, where = P.Not(P.And(body)), "not (" + " and ".join(ws) + ")"
        else:
            tree, where = P.Not(P.Or(body)), "not (" + " or ".join(ws) + ")"
        got = read_table_filtered(path, tree)
        want = duckdb.sql(
            f"select count(*) from read_parquet('{path}') where {where}"
        ).fetchone()[0]
        assert got.num_rows == want, (seed, where)
