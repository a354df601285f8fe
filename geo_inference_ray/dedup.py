"""Deduplication operators over the documents table.

Training-data-pipeline first-class components (build brief): exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.  All designed as streaming Ray Data stages:

* exact:    md5(text) column per batch -> groupby(hash) -> keep min doc_id.
            SQL oracle: md5() GROUP BY (DuckDB's md5 matches hashlib).
* minhash:  per-batch shingle->minhash sigs (vectorized), explode to
            (band, band_hash, doc_id) rows, groupby band buckets ->
            candidate pairs -> n-gram Jaccard verify (rows-only oracle).
* simhash:  64-bit simhash over token hashes; near-dup = hamming<=3 via
            4-segment LSH (exact-match segments), rows-only oracle.
* embedding: cosine near-dup over the embeddings table (see ann.py).

Scale notes: every step pre-aggregates inside map_batches before its
groupby; candidate verification joins only within buckets.  At 100 TB the
only all-to-all exchanges are groupbys on short hash keys (no payload
columns are shuffled — text is re-read per candidate-pair group via a
broadcast only at small scale; at large scale the verify stage carries
the shingle sets, which are bounded by NUM_PERM ints).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# MinHash parameters
NUM_PERM = 64
NUM_BANDS = 16  # rows per band = 4
SHINGLE_K = 3   # token 3-grams
MERSENNE = (1 << 31) - 1  # Mersenne-31: a*h < 2^62 fits uint64 (vectorized)

# SimHash
SIM_BITS = 64
SIM_SEGS = 4  # hamming<=3 guarantees one equal 16-bit segment


def _rng_coeffs(seed: int = 20240817):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, NUM_PERM, dtype=np.int64)
    b = rng.integers(0, MERSENNE, NUM_PERM, dtype=np.int64)
    return a, b


MINHASH_A, MINHASH_B = _rng_coeffs()


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of the token k-shingles of one document
    (blake2b-derived; no PYTHONHASHSEED dependence)."""
    toks = text.split(" ")
    if len(toks) < SHINGLE_K:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i:i + SHINGLE_K])
                    for i in range(len(toks) - SHINGLE_K + 1)]
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "little") for s in set(shingles)),
        dtype=np.uint64)
    return out


def add_md5(batch: pa.Table) -> pa.Table:
    """Exact-dedup key: hex md5 of text (matches DuckDB md5())."""
    h = [hashlib.md5(t.encode()).hexdigest()
         for t in batch["text"].to_pylist()]
    return batch.append_column("text_md5", pa.array(h, pa.string()))


def exact_dedup(ds):
    """Keep the lowest doc_id per identical text.  groupby on the 16-byte
    hash only (no text through the shuffle)."""
    import pandas as pd

    keyed = ds.map_batches(add_md5, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .select_columns(["doc_id", "text_md5"])

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"text_md5": [g["text_md5"].iloc[0]],
                             "doc_id": [g["doc_id"].min()]})

    return keyed.groupby("text_md5").map_groups(keep_first,
                                                batch_format="pandas")


class MinHasher:
    """Per-batch MinHash signatures (actor pool; permutation coefficients
    are one-time state).  Fully vectorized: (NUM_PERM, n_shingles)
    universal hashes (a*h+b) mod Mersenne-31 in uint64, column-min."""

    def __init__(self):
        self.a = MINHASH_A.astype(np.uint64)[:, None]
        self.b = MINHASH_B.astype(np.uint64)[:, None]

    def signature(self, text: str) -> np.ndarray:
        th = (_token_hashes(text) & np.uint64(MERSENNE))[None, :]
        v = (self.a * th + self.b) % np.uint64(MERSENNE)
        return v.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])
        return pa.table({
            "doc_id": pa.array(ids),
            "sig": pa.array(list(sigs), pa.list_(pa.int64(), NUM_PERM)),
        })


def band_rows(batch: pa.Table) -> pa.Table:
    """Explode signatures into (band, band_key, doc_id) rows for LSH."""
    ids = batch["doc_id"].to_numpy()
    sig = np.stack(batch["sig"].to_numpy(zero_copy_only=False))
    n, _ = sig.shape
    rows_per_band = NUM_PERM // NUM_BANDS
    out_band = np.repeat(np.arange(NUM_BANDS, dtype=np.int64), n)
    out_doc = np.tile(ids, NUM_BANDS)
    keys = np.empty((NUM_BANDS, n), dtype=object)
    for bnd in range(NUM_BANDS):
        seg = sig[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
        keys[bnd] = [hashlib.blake2b(seg[i].tobytes(), digest_size=8)
                     .hexdigest() for i in range(n)]
    return pa.table({
        "band": pa.array(out_band),
        "band_key": pa.array(keys.reshape(-1), pa.string()),
        "doc_id": pa.array(out_doc),
    })


def minhash_candidates(ds):
    """documents -> candidate near-dup pairs (doc_a < doc_b) via LSH.

    Pipeline: MinHash sigs (actor pool) -> band explode -> groupby(band,
    band_key) -> pairs within bucket -> distinct pairs.
    """
    import pandas as pd

    sigs = ds.map_batches(MinHasher, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))
    bands = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["doc_id"].to_numpy())
        if len(d) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(d), k=1)
        return pd.DataFrame({"doc_a": d[ia], "doc_b": d[ib]})

    pairs = bands.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # distinct pairs (same pair can fire in many bands)
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def jaccard_pairs(pairs_ds, texts_by_id_ref):
    """Verify candidate pairs with exact token-shingle Jaccard.

    ``texts_by_id_ref``: ray.put({doc_id: text}) broadcast — the verify
    side is small (candidates only).  At 100 TB scale this becomes a
    shuffle join of shingle-set sketches instead; documented trade-off.
    """
    import ray

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_by_id_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["doc_a"].to_numpy()
            b = batch["doc_b"].to_numpy()
            jac = np.empty(len(a))
            for i in range(len(a)):
                sa = set(_token_hashes(self.texts[int(a[i])]).tolist())
                sb = set(_token_hashes(self.texts[int(b[i])]).tolist())
                inter = len(sa & sb)
                jac[i] = inter / max(1, (len(sa) + len(sb) - inter))
            # milli-jaccard as int for exact comparisons
            return pa.table({
                "doc_a": pa.array(a), "doc_b": pa.array(b),
                "jaccard_milli": pa.array((jac * 1000).astype(np.int64)),
            })

    return pairs_ds.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 2))


class SimHasher:
    """64-bit SimHash over token hashes; emits 4x16-bit LSH segments."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        out = np.empty(len(ids), dtype=np.uint64)
        for i, t in enumerate(texts):
            th = _token_hashes(t).astype(np.uint64)
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = np.bitwise_or.reduce(
                (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        tbl = {"doc_id": pa.array(ids), "simhash": pa.array(out, pa.uint64())}
        for s in range(SIM_SEGS):
            seg = (out >> np.uint64(16 * s)) & np.uint64(0xFFFF)
            tbl[f"seg{s}"] = pa.array(seg.astype(np.int64))
        return pa.table(tbl)


def simhash_table(ds):
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))
