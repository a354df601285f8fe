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


# shingle-combine multipliers (odd 64-bit constants; uint64 wraparound
# multiplication is the mixing step — splitmix-style)
_SH_A1 = np.uint64(0x9E3779B97F4A7C15)
_SH_A2 = np.uint64(0xC2B2AE3D27D4EB4F)
_SH_A3 = np.uint64(0x165667B19E3779F9)

_TOKEN_CACHE: dict[str, int] = {}


def _hash_tokens(toks: list[str]) -> np.ndarray:
    """blake2b per UNIQUE token (process-cached — vocabularies are tiny
    next to token streams), returned as a uint64 array."""
    cache = _TOKEN_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(),
                "little")
            cache[t] = h
        out[i] = h
    return out


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of the (unique) token k-shingles of one
    document: cached per-token blake2b + vectorized positional combine
    (h1*A1 + h2*A2 + h3*A3, uint64 wraparound).  ~50x the per-shingle
    digest loop on long documents."""
    th = _hash_tokens(text.split(" "))
    if len(th) < SHINGLE_K:
        combo = np.zeros(1, dtype=np.uint64)
        for i, h in enumerate(th):
            combo = combo * _SH_A2 + h
        return np.unique(combo)
    with np.errstate(over="ignore"):
        sh = th[:-2] * _SH_A1 + th[1:-1] * _SH_A2 + th[2:] * _SH_A3
    return np.unique(sh)


def add_md5(batch: pa.Table) -> pa.Table:
    """Exact-dedup key: hex md5 of text (matches DuckDB md5())."""
    h = [hashlib.md5(t.encode()).hexdigest()
         for t in batch["text"].to_pylist()]
    return batch.append_column("text_md5", pa.array(h, pa.string()))


def exact_dedup(ds):
    """Keep the lowest doc_id per identical text.  groupby on the hash
    only (no text through the shuffle); the reduce is a vectorized Min
    aggregate — never per-group Python (a map_groups here costs one
    pandas call per group, i.e. per distinct document)."""
    from ray.data.aggregate import Min

    keyed = ds.map_batches(add_md5, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .select_columns(["doc_id", "text_md5"])
    return keyed.groupby("text_md5").aggregate(
        Min("doc_id", alias_name="doc_id"))


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

    Pipeline: MinHash sigs (actor pool) -> band explode -> bucket-size
    pre-pass (vectorized Count aggregate; almost every bucket is a
    singleton, and per-group Python over 80K singleton buckets was the
    whole runtime) -> broadcast the >=2 bucket set -> pairs within the
    surviving buckets -> distinct pairs.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    import tempfile

    import ray.data as rd

    sigs = ds.map_batches(MinHasher, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))
    # the band table is consumed twice (count pre-pass + pair pass) and
    # MinHash signatures are expensive to recompute — spill the compact
    # (band, key, doc_id) table to parquet scratch and re-read it,
    # instead of pinning it in the object store (at 100 TB the spill is
    # disk-backed and partition-resumable; plasma pinning is not)
    spill = tempfile.mkdtemp(prefix="minhash_bands_", dir="/tmp")
    sigs.map_batches(band_rows, batch_format="pyarrow") \
        .write_parquet(spill)
    bands = rd.read_parquet(spill)

    counts = bands.groupby(["band", "band_key"]).aggregate(
        Count(alias_name="n"))
    hot = set()
    for b in counts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n = b["n"].to_numpy()
        bd = b["band"].to_numpy()
        for band, key in zip(bd[n >= 2].tolist(),
                             np.asarray(b["band_key"])[n >= 2].tolist()):
            hot.add((band, key))
    if not hot:
        import ray.data as rd
        return rd.from_items([]).map_batches(
            lambda b: pa.table({"doc_a": pa.array([], pa.int64()),
                                "doc_b": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    hot_ref = ray.put(hot)

    class FilterHot:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bd = batch["band"].to_numpy()
            keys = batch["band_key"].to_pylist()
            keep = np.fromiter(((b, k) in self.hot
                                for b, k in zip(bd.tolist(), keys)),
                               dtype=bool, count=len(bd))
            return batch.filter(pa.array(keep))

    survivors = bands.map_batches(FilterHot, batch_format="pyarrow",
                                  zero_copy_batch=True, concurrency=(1, 4))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["doc_id"].to_numpy())
        if len(d) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(d), k=1)
        return pd.DataFrame({"doc_a": d[ia], "doc_b": d[ib]})

    pairs = survivors.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # distinct pairs (same pair can fire in many bands) — vectorized
    # Count aggregate, then drop the count column
    distinct = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_n"))
    return distinct.drop_columns(["_n"])


def _empty_verified():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard_milli": pa.array([], pa.int64())}))


def jaccard_pairs(pairs_ds, docs_ds, num_partitions: int = 8):
    """Verify candidate pairs with exact token-shingle Jaccard — fully
    distributed.

    Document TEXT never reaches the driver: only the candidate doc-id
    set does (ints, bounded by the duplicate rate, orders of magnitude
    below the corpus).  Shingle-hash arrays are computed inside
    map_batches for candidate docs only, then hash-joined to the pair
    rows on each side; the Jaccard is an intersect of two sorted unique
    uint64 arrays per pair.
    """
    import ray
    import ray.data as rd

    pairs = pairs_ds.materialize()  # candidate pairs only (small side)
    cand: set = set()
    n_pairs = 0
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n_pairs += len(b)
        cand.update(b["doc_a"].to_pylist())
        cand.update(b["doc_b"].to_pylist())
    if not cand:
        return _empty_verified()
    # scale the join fan-out to the candidate volume: Ray 2.49's hash
    # join emits schema-less empty partitions (which crash downstream),
    # so never create more partitions than ~10k pair-rows can fill
    num_partitions = max(1, min(num_partitions, -(-n_pairs // 10_000)))
    ids_ref = ray.put(np.fromiter(cand, dtype=np.int64, count=len(cand)))

    class CandShingles:
        """Emit (doc_id, sh: binary) for candidate docs only.  The
        shingle-hash array travels as raw uint64 bytes because Acero
        hash joins accept binary payloads but not list columns."""

        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            d = batch["doc_id"].to_numpy()
            keep = np.isin(d, self.ids)
            d = d[keep]
            texts = batch.filter(pa.array(keep))["text"].to_pylist()
            sh = [_token_hashes(t).tobytes() for t in texts]
            return pa.table({
                "doc_id": pa.array(d),
                "sh": pa.array(sh, pa.binary()),
            })

    shingles = docs_ds.map_batches(CandShingles, batch_format="pyarrow",
                                   zero_copy_batch=True, concurrency=(1, 4))

    # ONE hash join only (chaining Ray 2.49 joins trips on empty
    # schema-less partitions): explode each pair into two doc-keyed
    # rows, join the shingle table once, then group by pair and
    # intersect the two shingle arrays.
    def explode(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, b])),
            "doc_a": pa.array(np.concatenate([a, a])),
            "doc_b": pa.array(np.concatenate([b, b])),
        })

    pairrows = pairs.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True)
    j = pairrows.join(shingles, join_type="inner",
                      num_partitions=num_partitions, on=("doc_id",))

    import pandas as pd

    def per_pair(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:  # a side vanished (shouldn't happen on inner)
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "jaccard_milli": pd.Series([], dtype=np.int64)})
        xa = np.frombuffer(g["sh"].iloc[0], dtype=np.uint64)
        xb = np.frombuffer(g["sh"].iloc[1], dtype=np.uint64)
        inter = len(np.intersect1d(xa, xb, assume_unique=True))
        jac = inter / max(1, len(xa) + len(xb) - inter)
        return pd.DataFrame({
            "doc_a": g["doc_a"].iloc[:1].astype(np.int64),
            "doc_b": g["doc_b"].iloc[:1].astype(np.int64),
            "jaccard_milli": np.array([int(jac * 1000)], dtype=np.int64)})

    return j.groupby(["doc_a", "doc_b"]).map_groups(
        per_pair, batch_format="pandas")


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
