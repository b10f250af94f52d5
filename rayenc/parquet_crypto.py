"""Parquet modular encryption (AES_GCM_V1) — write + read primitives.

Implements the parquet-format encryption spec as realized by the reference:
module AAD construction (`crypto/AesCipher.java:75-121`: fileAAD + module
type byte + rg/column/page ordinals as LE shorts), the GCM ciphertext
framing (`crypto/AesGcmEncryptor.java:53-90`: ``len(4 LE) | nonce(12) |
ciphertext | tag(16)`` where len counts nonce+ct+tag), the ten module types
(`crypto/ModuleCipherFactory.java:27-47`), and the two footer modes of
`ParquetFileWriter.serializeFooter:2104-2171` (encrypted footer behind the
``PARE`` magic with a plaintext FileCryptoMetaData prefix; plaintext footer
with a 28-byte nonce+tag signature). The AES primitive is
``cryptography``'s AESGCM; everything else is hand-rolled like the rest of
the writer.
"""

from __future__ import annotations

import base64
import os
import struct
from dataclasses import dataclass, field

NONCE_LEN = 12
TAG_LEN = 16
AAD_FILE_UNIQUE_LEN = 8
SIZE_LEN = 4

# ModuleCipherFactory.ModuleType values
M_FOOTER = 0
M_COLUMN_METADATA = 1
M_DATA_PAGE = 2
M_DICT_PAGE = 3
M_DATA_PAGE_HEADER = 4
M_DICT_PAGE_HEADER = 5
M_COLUMN_INDEX = 6
M_OFFSET_INDEX = 7
M_BLOOM_HEADER = 8
M_BLOOM_BITSET = 9

MAGIC_ENCRYPTED = b"PARE"


def _aesgcm(key: bytes):
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    if len(key) not in (16, 24, 32):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    return AESGCM(key)


def module_aad(
    file_aad: bytes, module_type: int, rg: int = -1, col: int = -1, page: int = -1
) -> bytes:
    """AAD suffix per AesCipher.createModuleAAD: footer gets no ordinals,
    data pages/headers get all three, other modules get rg+column."""
    if module_type == M_FOOTER:
        return file_aad + bytes([module_type])
    if rg < 0 or col < 0 or rg > 0x7FFF or col > 0x7FFF:
        raise ValueError(f"bad ordinals rg={rg} col={col}")
    out = file_aad + bytes([module_type]) + struct.pack("<hh", rg, col)
    if module_type in (M_DATA_PAGE, M_DATA_PAGE_HEADER):
        if page < 0 or page > 0x7FFF:
            raise ValueError(f"bad page ordinal {page}")
        out += struct.pack("<h", page)
    return out


def encrypt_module(key: bytes, plaintext: bytes, aad: bytes) -> bytes:
    """GCM module ciphertext: 4-byte LE length (nonce+ct+tag) | nonce | ct|tag."""
    nonce = os.urandom(NONCE_LEN)
    ct = _aesgcm(key).encrypt(nonce, bytes(plaintext), aad)
    body = nonce + ct
    return struct.pack("<i", len(body)) + body


def encrypt_module_ctr(key: bytes, plaintext: bytes) -> bytes:
    """AES_GCM_CTR_V1 page module: 4-byte LE length | 12-byte nonce |
    CTR ciphertext (no tag, no AAD). The CTR IV is nonce || 32-bit counter
    starting at 1 (AesCtrEncryptor.java:45-47)."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    nonce = os.urandom(NONCE_LEN)
    iv = nonce + b"\x00\x00\x00\x01"
    enc = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    ct = enc.update(bytes(plaintext)) + enc.finalize()
    body = nonce + ct
    return struct.pack("<i", len(body)) + body


def decrypt_module_ctr(key: bytes, buf, offset: int) -> tuple[bytes, int]:
    """Inverse of encrypt_module_ctr (AesCtrDecryptor semantics)."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    b = bytes(buf[offset : offset + SIZE_LEN])
    (length,) = struct.unpack("<i", b)
    start = offset + SIZE_LEN
    body = bytes(buf[start : start + length])
    nonce, ct = body[:NONCE_LEN], body[NONCE_LEN:]
    iv = nonce + b"\x00\x00\x00\x01"
    dec = Cipher(algorithms.AES(key), modes.CTR(iv)).decryptor()
    return dec.update(ct) + dec.finalize(), start + length


def decrypt_module(key: bytes, buf, offset: int, aad: bytes) -> tuple[bytes, int]:
    """Decrypt one framed module at ``buf[offset:]``; returns (plaintext,
    offset just past the module). Raises ValueError naming the module AAD on
    tag mismatch — wrong key, wrong AAD prefix, or corrupted ciphertext
    (TagVerificationException semantics in the reference's AesGcmDecryptor)."""
    b = bytes(buf[offset : offset + SIZE_LEN])
    (length,) = struct.unpack("<i", b)
    start = offset + SIZE_LEN
    body = bytes(buf[start : start + length])
    nonce, ct = body[:NONCE_LEN], body[NONCE_LEN:]
    try:
        return _aesgcm(key).decrypt(nonce, ct, aad), start + length
    except Exception as ex:
        raise ValueError(
            f"GCM tag verification failed for module at offset {offset}: "
            "wrong key, wrong AAD prefix, or corrupted data"
        ) from ex


def encrypt_key_locally(key_bytes: bytes, wrapping_key: bytes, aad: bytes) -> str:
    """KeyToolkit.encryptKeyLocally (KeyToolkit.java:292): AES-GCM without
    the 4-byte length frame -> base64(nonce | ct | tag). Used to wrap a DEK
    with a KEK in double-wrapping key material."""
    import base64 as b64

    nonce = os.urandom(NONCE_LEN)
    ct = _aesgcm(wrapping_key).encrypt(nonce, bytes(key_bytes), aad)
    return b64.b64encode(nonce + ct).decode()


def decrypt_key_locally(wrapped_b64: str, wrapping_key: bytes, aad: bytes) -> bytes:
    """KeyToolkit.decryptKeyLocally (KeyToolkit.java:310) inverse."""
    import base64 as b64

    body = b64.b64decode(wrapped_b64)
    nonce, ct = body[:NONCE_LEN], body[NONCE_LEN:]
    return _aesgcm(wrapping_key).decrypt(nonce, ct, aad)


def double_wrapped_key_material(
    dek: bytes,
    master_key_id: str,
    is_footer: bool,
    kek: bytes | None = None,
    kek_id: bytes | None = None,
    kms_wrap=None,
) -> bytes:
    """PKMT1 key-material JSON in DOUBLE wrapping mode
    (`crypto/keytools/FileKeyWrapper.java:135-156` + KeyMaterial.java
    field set): the DEK is encrypted locally with a random KEK (AAD = raw
    kekID bytes), and the KEK is wrapped by the KMS under the master key.
    ``kms_wrap(key_bytes, master_key_id) -> str`` defaults to the trivial
    base64 test KMS. One (kek, kek_id) pair may be shared across the
    columns of a file, mirroring KEKPerMasterKeyID caching."""
    import json

    kek = kek or os.urandom(16)
    kek_id = kek_id or os.urandom(16)
    wrapped_kek = (
        kms_wrap(kek, master_key_id)
        if kms_wrap is not None
        else base64.b64encode(kek).decode()
    )
    d = {"keyMaterialType": "PKMT1", "internalStorage": True,
         "isFooterKey": is_footer}
    if is_footer:
        d.update({"kmsInstanceID": "DEFAULT", "kmsInstanceURL": "DEFAULT"})
    d.update(
        {
            "masterKeyID": master_key_id,
            "wrappedDEK": encrypt_key_locally(dek, kek, kek_id),
            "doubleWrapping": True,
            # KeyMaterial.java:65 spells the kekID field in full
            "keyEncryptionKeyID": base64.b64encode(kek_id).decode(),
            "wrappedKEK": wrapped_kek,
        }
    )
    return json.dumps(d).encode()


def gcm_signature(key: bytes, plaintext: bytes, aad: bytes) -> bytes:
    """Plaintext-footer signature: nonce + GCM tag of the serialized footer
    (serializeFooter:2140-2152 copies nonce then tag)."""
    nonce = os.urandom(NONCE_LEN)
    ct = _aesgcm(key).encrypt(nonce, bytes(plaintext), aad)
    return nonce + ct[-TAG_LEN:]


def verify_gcm_signature(
    key: bytes, plaintext: bytes, signature: bytes, aad: bytes
) -> bool:
    nonce, tag = signature[:NONCE_LEN], signature[NONCE_LEN:]
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    from cryptography.exceptions import InvalidTag

    # re-encrypt with the recorded nonce and compare tags (GCM is
    # deterministic given key/nonce/aad)
    import hmac

    ct = AESGCM(key).encrypt(nonce, bytes(plaintext), aad)
    return hmac.compare_digest(ct[-TAG_LEN:], bytes(tag))


@dataclass
class FileEncryption:
    """Write-side encryption properties (FileEncryptionProperties.java
    analog). ``column_keys`` maps dotted leaf paths to per-column keys;
    every other column uses the footer key. ``plaintext_footer=True``
    keeps the footer readable by legacy readers and appends a GCM
    signature instead of encrypting it."""

    footer_key: bytes
    column_keys: dict[str, bytes] = field(default_factory=dict)
    plaintext_footer: bool = False
    aad_prefix: bytes | None = None
    store_aad_prefix: bool = True
    footer_key_metadata: bytes | None = None
    column_key_metadata: dict[str, bytes] = field(default_factory=dict)
    # "AES_GCM_V1" (every module GCM) or "AES_GCM_CTR_V1" (page bodies in
    # CTR without tags — the faster mode; thrift modules stay GCM:
    # InternalFileEncryptor.getDataModuleEncryptor:71-84)
    algorithm: str = "AES_GCM_V1"

    def __post_init__(self):
        _aesgcm(self.footer_key)  # validate length
        for k in self.column_keys.values():
            _aesgcm(k)
        if self.algorithm not in ("AES_GCM_V1", "AES_GCM_CTR_V1"):
            raise ValueError(f"unsupported algorithm {self.algorithm}")

    def make_file_aad(self) -> tuple[bytes, bytes]:
        """(aad_file_unique, file_aad)."""
        unique = os.urandom(AAD_FILE_UNIQUE_LEN)
        prefix = self.aad_prefix or b""
        return unique, prefix + unique

    def key_for(self, dotted_path: str) -> tuple[bytes, bool]:
        """(key, uses_column_key) for one leaf column."""
        k = self.column_keys.get(dotted_path)
        if k is not None:
            return k, True
        return self.footer_key, False


@dataclass
class FileDecryption:
    """Read-side keys (FileDecryptionProperties.java analog). ``aad_prefix``
    must be supplied when the writer chose not to store it.

    ``kms_unwrap(wrapped_b64, master_key_id) -> key bytes`` resolves
    KMS-wrapped key material (`KmsClient.unwrapKey`); the default mirrors
    the trivial test KMS (base64 identity) used across the interop tests."""

    footer_key: bytes | None = None
    column_keys: dict[str, bytes] = field(default_factory=dict)
    aad_prefix: bytes | None = None
    kms_unwrap: "object" = None

    def unwrap(self, wrapped_b64: str, master_key_id: str) -> bytes:
        if self.kms_unwrap is not None:
            return self.kms_unwrap(wrapped_b64, master_key_id)
        return base64.b64decode(wrapped_b64)

    def key_for(self, dotted_path: str) -> bytes:
        k = self.column_keys.get(dotted_path)
        if k is None:
            k = self.footer_key
        if k is None:
            raise ValueError(f"no key available for column {dotted_path!r}")
        return k


# ----------------------- external key material (FileSystemKeyMaterialStore)

KEY_MATERIAL_FILE_PREFIX = "_KEY_MATERIAL_FOR_"
KEY_MATERIAL_TEMP_PREFIX = "_TMP"
KEY_MATERIAL_FILE_SUFFIX = ".json"
FOOTER_KEY_ID_IN_FILE = "footerKey"  # KeyMaterial.FOOTER_KEY_ID_IN_FILE
COLUMN_KEY_ID_PREFIX = "columnKey"  # KeyMaterial.COLUMN_KEY_ID_IN_FILE_PREFIX


def key_material_store_path(parquet_path: str, temp: bool = False) -> str:
    """Sidecar path next to the parquet file
    (`HadoopFSKeyMaterialStore.initialize:53-56`):
    ``[_TMP]_KEY_MATERIAL_FOR_<file name>.json`` in the same directory."""
    import os as _os

    d, name = _os.path.split(parquet_path)
    prefix = (KEY_MATERIAL_TEMP_PREFIX if temp else "") + KEY_MATERIAL_FILE_PREFIX
    return _os.path.join(d, prefix + name + KEY_MATERIAL_FILE_SUFFIX)


def external_key_metadata(key_reference: str) -> bytes:
    """Key metadata stored IN the parquet file when the material lives in
    the sidecar (`KeyMetadata.java:41-52`): type + internalStorage=false +
    the reference into the store."""
    import json

    return json.dumps(
        {
            "keyMaterialType": "PKMT1",
            "internalStorage": False,
            "keyReference": key_reference,
        }
    ).encode()


def write_key_material_store(
    parquet_path: str, material: "dict[str, str]", temp: bool = False
) -> str:
    """Persist {key id in file -> key material JSON string} as the sidecar
    (`HadoopFSKeyMaterialStore.saveMaterial:77-88`, a Jackson string map)."""
    import json

    path = key_material_store_path(parquet_path, temp)
    with open(path, "w") as f:
        json.dump(material, f)
    return path


def read_key_material_store(parquet_path: str) -> "dict[str, str]":
    import json

    with open(key_material_store_path(parquet_path)) as f:
        return json.load(f)


def make_external_encryption(
    parquet_path: str,
    footer_key: bytes,
    footer_master_id: str,
    column_keys: "dict[str, tuple[bytes, str]] | None" = None,
    kms_wrap=None,
    **kwargs,
) -> "FileEncryption":
    """FileEncryption whose key material is written to the sidecar store
    instead of the file (FileKeyWrapper with a KeyMaterialStore:
    `FileKeyWrapper.java:160-180`): each key's double-wrapped PKMT1
    material lands in `_KEY_MATERIAL_FOR_<name>.json` under "footerKey" /
    "columnKey<N>", and the in-file metadata carries only the reference.
    ``column_keys`` maps dotted column paths to (key, master key id)."""
    material: dict[str, str] = {
        FOOTER_KEY_ID_IN_FILE: double_wrapped_key_material(
            footer_key, footer_master_id, True, kms_wrap=kms_wrap
        ).decode()
    }
    col_key_bytes: dict[str, bytes] = {}
    col_meta: dict[str, bytes] = {}
    for i, (dotted, (key, master)) in enumerate(
        sorted((column_keys or {}).items()), start=1
    ):
        ref = f"{COLUMN_KEY_ID_PREFIX}{i}"
        material[ref] = double_wrapped_key_material(
            key, master, False, kms_wrap=kms_wrap
        ).decode()
        col_key_bytes[dotted] = key
        col_meta[dotted] = external_key_metadata(ref)
    write_key_material_store(parquet_path, material)
    return FileEncryption(
        footer_key=footer_key,
        column_keys=col_key_bytes,
        footer_key_metadata=external_key_metadata(FOOTER_KEY_ID_IN_FILE),
        column_key_metadata=col_meta,
        **kwargs,
    )


def unwrap_key_material_entry(material_json: str, kms_unwrap=None) -> "tuple[bytes, str]":
    """(DEK, masterKeyID) from one PKMT1 material string — the
    `FileKeyUnwrapper.getDEKandMasterID` step. ``kms_unwrap(wrapped, master)
    -> bytes`` defaults to the trivial base64 test KMS."""
    import json

    km = json.loads(material_json)
    master = km.get("masterKeyID", "")
    unwrap = kms_unwrap or (lambda wrapped, m: base64.b64decode(wrapped))
    if not km.get("doubleWrapping"):
        return unwrap(km["wrappedDEK"], master), master
    kek = unwrap(km["wrappedKEK"], master)
    kek_id = base64.b64decode(km["keyEncryptionKeyID"])
    nonce_ct = base64.b64decode(km["wrappedDEK"])
    dek = _aesgcm(kek).decrypt(nonce_ct[:NONCE_LEN], nonce_ct[NONCE_LEN:], kek_id)
    return dek, master


def rotate_master_keys(
    folder: str, kms_unwrap=None, kms_wrap=None
) -> "list[str]":
    """`KeyToolkit.rotateMasterKeys:200-264` for external key material:
    for every parquet file in ``folder`` with a sidecar store, unwrap each
    DEK through the old KMS state, re-wrap it with a FRESH KEK under the
    same master key id through the new KMS state, write a `_TMP` store,
    then atomically replace the live one. The parquet files themselves are
    never touched — only the sidecars change. Returns the rotated files.
    Raises on internal-storage files (no sidecar), matching the
    reference's UnsupportedOperationException."""
    import json
    import os as _os

    rotated = []
    for name in sorted(_os.listdir(folder)):
        if not name.endswith(".parquet") or name.startswith("_"):
            continue
        fpath = _os.path.join(folder, name)
        store_path = key_material_store_path(fpath)
        if not _os.path.exists(store_path):
            raise ValueError(
                f"key rotation needs external key material; no sidecar for {fpath}"
            )
        with open(store_path) as f:
            store = json.load(f)
        kek, kek_id = os.urandom(16), os.urandom(16)  # fresh KEK per file
        new_store = {}
        for ref, material in store.items():
            dek, master = unwrap_key_material_entry(material, kms_unwrap)
            new_store[ref] = double_wrapped_key_material(
                dek, master, ref == FOOTER_KEY_ID_IN_FILE,
                kek=kek, kek_id=kek_id, kms_wrap=kms_wrap,
            ).decode()
        tmp = write_key_material_store(fpath, new_store, temp=True)
        _os.replace(tmp, store_path)
        rotated.append(fpath)
    return rotated
