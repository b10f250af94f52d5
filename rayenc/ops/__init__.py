"""Large-scale training-data pipeline operators on Ray Data Datasets.

Beyond the reference's encode stack: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), approximate similarity search,
and text analysis (language id, quality scoring, token counting,
fingerprinting) — each expressed Ray-Data-first: vectorized ``map_batches``
for the narrow stages, ``groupby`` only where co-location is semantically
required, small sides broadcast via ``ray.put``.
"""
