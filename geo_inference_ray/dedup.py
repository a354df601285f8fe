"""Deduplication operators over the documents table.

Training-data-pipeline first-class components (build brief): exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.  All designed as streaming Ray Data stages:

* exact:    md5(text) column per batch -> groupby(hash) -> keep min doc_id.
            SQL oracle: md5() GROUP BY (DuckDB's md5 matches hashlib).
* minhash:  per-batch shingle->minhash sigs (vectorized), explode to
            (gid, doc_id) rows, groupby band buckets ->
            candidate pairs -> n-gram Jaccard verify.  The whole family
            is derandomized mod-Mersenne-31 arithmetic with an exact
            DuckDB oracle (see __ray_entry__._minhash_sql_chain).
* simhash:  64-bit simhash over shingle hashes; near-dup = hamming<=3
            via 4-segment LSH (exact-match segments); exact SQL oracle.
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

# MinHash parameters.  The whole hash family is DERANDOMIZED and kept
# inside mod-Mersenne-31 arithmetic so every step has an exact DuckDB
# mirror (operands < 2^31 keep all products < 2^62, i.e. BIGINT-safe on
# both sides — see __ray_entry__.oracle_sql 'minhash_pairs'):
#   token t  = ('0x' || substr(md5(tok), 1, 15))::BIGINT % M
#   shingle  = (t1*C1 % M + t2*C2 % M + t3*C3 % M) % M     (token 3-gram)
#   sig_p    = min over shingles of (a_p*sh + b_p) % M
#   band key = fold over the band's sig rows: k = (k*KB % M + s) % M
NUM_PERM = 64
NUM_BANDS = 16  # rows per band = 4
SHINGLE_K = 3   # token 3-grams
MERSENNE = (1 << 31) - 1

# Public LCG multipliers/increments (Numerical Recipes, glibc, VAX,
# Borland) as the fixed mixing constants — all < 2^31.
SH_C1 = 1664525
SH_C2 = 1103515245
SH_C3 = 69069
BAND_KB = 22695477

# SimHash: three LCG mixes of the 31-bit shingle hash supply the 64
# vote bits (31 + 31 + 2).
SIM_BITS = 64
SIM_SEGS = 4  # hamming<=3 guarantees one equal 16-bit segment
SIM_G1, SIM_H1 = 1664525, 1013904223
SIM_G2, SIM_H2 = 1103515245, 12345
SIM_G3, SIM_H3 = 69069, 362437


def _rng_coeffs(seed: int = 20240817):
    """Fixed-seed universal-hash coefficients; the literal values are
    embedded into the SQL oracle, so the RNG is just a one-time
    constant generator."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, NUM_PERM, dtype=np.int64)
    b = rng.integers(0, MERSENNE, NUM_PERM, dtype=np.int64)
    return a, b


MINHASH_A, MINHASH_B = _rng_coeffs()

_TOKEN_CACHE: dict[str, int] = {}


def _hash_tokens(toks: list[str]) -> np.ndarray:
    """md5-derived 31-bit hash per UNIQUE token (process-cached —
    vocabularies are tiny next to token streams), as int64 < M.
    Matches ('0x' || substr(md5(tok),1,15))::BIGINT % M in DuckDB."""
    cache = _TOKEN_CACHE
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % MERSENNE
            cache[t] = h
        out[i] = h
    return out


def _token_hashes(text: str) -> np.ndarray:
    """Stable 31-bit hashes of the (unique) token k-shingles of one
    document: cached per-token md5 + vectorized positional combine mod
    Mersenne-31.  31-bit shingle identity is deliberate: collisions
    only add rare false candidate pairs (verified downstream) and keep
    the family SQL-expressible."""
    th = _hash_tokens(text.split(" "))
    M = MERSENNE
    if len(th) < SHINGLE_K:
        combo = 0
        for h in th.tolist():
            combo = (combo * SH_C2 % M + h) % M
        return np.array([combo], dtype=np.int64)
    sh = (th[:-2] * SH_C1 % M + th[1:-1] * SH_C2 % M
          + th[2:] * SH_C3 % M) % M
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
    universal hashes (a*h+b) mod Mersenne-31 in int64, column-min."""

    def __init__(self):
        self.a = MINHASH_A[:, None]
        self.b = MINHASH_B[:, None]

    def signature(self, text: str) -> np.ndarray:
        th = _token_hashes(text)[None, :]
        v = (self.a * th + self.b) % MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])
        return pa.table({
            "doc_id": pa.array(ids),
            "sig": pa.array(list(sigs), pa.list_(pa.int64(), NUM_PERM)),
        })


def band_rows(batch: pa.Table) -> pa.Table:
    """Explode signatures into (gid, doc_id) rows for LSH, where
    gid = band * 2^31 + band_key packs the (band, band_key < M31) pair
    into one int64 group key (vectorized isin / partitioning all the
    way down; the SQL oracle joins on the equivalent (band, key))."""
    ids = batch["doc_id"].to_numpy()
    sig = np.stack(batch["sig"].to_numpy(zero_copy_only=False))
    n, _ = sig.shape
    rows_per_band = NUM_PERM // NUM_BANDS
    out_doc = np.tile(ids, NUM_BANDS)
    keys = np.empty((NUM_BANDS, n), dtype=np.int64)
    for bnd in range(NUM_BANDS):
        seg = sig[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
        k = seg[:, 0].copy()
        for r in range(1, rows_per_band):
            k = (k * BAND_KB % MERSENNE + seg[:, r]) % MERSENNE
        keys[bnd] = k + (bnd << 31)
    return pa.table({
        "gid": pa.array(keys.reshape(-1)),
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
    # (gid, doc_id) table to parquet scratch and re-read it,
    # instead of pinning it in the object store (at 100 TB the spill is
    # disk-backed and partition-resumable; plasma pinning is not)
    spill = tempfile.mkdtemp(prefix="minhash_bands_", dir="/tmp")
    sigs.map_batches(band_rows, batch_format="pyarrow") \
        .write_parquet(spill)
    bands = rd.read_parquet(spill)

    counts = bands.groupby("gid").aggregate(Count(alias_name="n"))
    hot_parts = []
    for b in counts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n = b["n"].to_numpy()
        hot_parts.append(b["gid"].to_numpy()[n >= 2])
    hot = (np.sort(np.concatenate(hot_parts)) if hot_parts
           else np.array([], dtype=np.int64))
    if not len(hot):
        import ray.data as rd
        return rd.from_items([]).map_batches(
            lambda b: pa.table({"doc_a": pa.array([], pa.int64()),
                                "doc_b": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    hot_ref = ray.put(hot)

    class FilterHot:
        def __init__(self):
            self.hot = ray.get(hot_ref)  # sorted int64 gid array

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = np.isin(batch["gid"].to_numpy(), self.hot,
                           assume_unique=False)
            return batch.filter(pa.array(keep))

    survivors = bands.map_batches(FilterHot, batch_format="pyarrow",
                                  zero_copy_batch=True, concurrency=(1, 4))

    def bucket_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        """ONE kernel for every bucket in the partition: sort by
        (gid, doc_id), find group runs, emit within-group all-pairs.
        The per-group work is a 2-line numpy slice — the per-group
        pandas-call trap only bites when each group is a map_groups
        invocation."""
        g = g.sort_values(["gid", "doc_id"], kind="stable") \
            .reset_index(drop=True)
        gi = g["gid"].to_numpy()
        ids = g["doc_id"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = gi[1:] != gi[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        out_a, out_b = [], []
        for st, sz in zip(starts.tolist(), sizes.tolist()):
            if sz < 2:
                continue
            d = ids[st:st + sz]  # already sorted within the run
            ia, ib = np.triu_indices(sz, k=1)
            out_a.append(d[ia])
            out_b.append(d[ib])
        if not out_a:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    from .relational import _hash_partitioned
    from .shuffle import arrow_bridge

    pairs = arrow_bridge(
        _hash_partitioned(survivors, "gid", bucket_pairs_part),
        {"doc_a": pa.int64(), "doc_b": pa.int64()})

    # distinct pairs (the same pair fires in up to NUM_BANDS bands):
    # hash-partition on doc_a (all firings of a pair share it) and
    # drop_duplicates vectorized per partition — one single-key
    # exchange instead of a two-key groupby over the pre-distinct pair
    # volume (the two-key hash shuffle measured ~10x slower here)
    def distinct_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])

    return arrow_bridge(
        _hash_partitioned(pairs, "doc_a", distinct_part),
        {"doc_a": pa.int64(), "doc_b": pa.int64()})


_CAND_MEMO: dict = {}


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
    int64 arrays per pair (31-bit shingle hashes).
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

    # Stateless TASK fn (per-worker memoized candidate-id array): an
    # actor pool here pins a CPU next to the hash-join aggregator
    # actors, which deadlocks narrow sessions (2 CPUs: pool + join
    # actor starve the read task).  Emits (doc_id, sh: binary) for
    # candidate docs only; the shingle-hash array travels as raw int64
    # bytes because Acero hash joins accept binary payloads but not
    # list columns.
    memo_key = ids_ref.hex()

    def cand_shingles(batch: pa.Table) -> pa.Table:
        # single-slot memo (replace on key mismatch): an unbounded dict
        # would pin one plasma buffer per jaccard_pairs call for the
        # life of the worker
        ids = _CAND_MEMO.get(memo_key)
        if ids is None:
            ids = ray.get(ids_ref)
            _CAND_MEMO.clear()
            _CAND_MEMO[memo_key] = ids
        d = batch["doc_id"].to_numpy()
        keep = np.isin(d, ids)
        d = d[keep]
        texts = batch.filter(pa.array(keep))["text"].to_pylist()
        sh = [_token_hashes(t).tobytes() for t in texts]
        return pa.table({
            "doc_id": pa.array(d),
            "sh": pa.array(sh, pa.binary()),
        })

    shingles = docs_ds.map_batches(cand_shingles, batch_format="pyarrow",
                                   zero_copy_batch=True)

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

    from .relational import _hash_partitioned
    from .shuffle import arrow_bridge

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        """ONE kernel for every pair in the partition (both sides of a
        pair share doc_a, so partitioning on doc_a keeps them
        together).  A map_groups per pair costs one pandas call per
        candidate — 33 s for 34 K pairs; this kernel is a numpy loop
        over consecutive pair duos."""
        g = g.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [n]]))
        sh = g["sh"].to_numpy()
        oa, ob, oj = [], [], []
        for st, sz in zip(starts.tolist(), sizes.tolist()):
            if sz != 2:  # a side vanished (shouldn't happen on inner)
                continue
            xa = np.frombuffer(sh[st], dtype=np.int64)
            xb = np.frombuffer(sh[st + 1], dtype=np.int64)
            inter = np.intersect1d(xa, xb, assume_unique=True).size
            # pure integer arithmetic (floor), // in the oracle too
            oa.append(a[st])
            ob.append(b[st])
            oj.append(1000 * inter
                      // max(1, xa.size + xb.size - inter))
        return pd.DataFrame({
            "doc_a": np.array(oa, dtype=np.int64),
            "doc_b": np.array(ob, dtype=np.int64),
            "jaccard_milli": np.array(oj, dtype=np.int64)})

    return arrow_bridge(
        _hash_partitioned(j, "doc_a", verify_part),
        {"doc_a": pa.int64(), "doc_b": pa.int64(),
         "jaccard_milli": pa.int64()})


def dedup_clusters(docs_ds, pairs_ds):
    """Connected components over the near-dup pair graph -> one cluster
    representative (min doc_id) per document; the "drop duplicates"
    step after candidate generation.

    Scale shape: the PAIR table is bounded by the duplicate rate —
    orders of magnitude below the corpus (same argument as the Jaccard
    verify) — so union-find runs driver-side over pair ids only; the
    resulting cluster map is broadcast and joined to the full corpus
    inside map_batches (no shuffle of the documents table at all).
    """
    import ray

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for b in pairs_ds.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        for a, bb in zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist()):
            ra, rb = find(a), find(bb)
            if ra != rb:  # union by min id keeps the rep deterministic
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    cluster = {x: find(x) for x in list(parent)}
    cmap_ref = ray.put(cluster)

    class AttachCluster:
        def __init__(self):
            self.cmap = ray.get(cmap_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy()
            out = np.fromiter((self.cmap.get(i, i) for i in ids.tolist()),
                              dtype=np.int64, count=len(ids))
            return pa.table({"doc_id": pa.array(ids),
                             "cluster": pa.array(out)})

    return docs_ds.map_batches(AttachCluster, batch_format="pyarrow",
                               zero_copy_batch=True, concurrency=(1, 4))


class RepetitionRatio:
    """Per-document duplicate-shingle ratio (Gopher/C4-style web-text
    quality signal): rep_milli = 1000 * (total - distinct) // total over
    token 3-grams.  Shares the SQL-mirrorable shingle family, so the
    oracle reuses the same CTE chain."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        tot = np.empty(len(ids), dtype=np.int64)
        dis = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(texts):
            ntok = t.count(" ") + 1
            tot[i] = max(ntok - (SHINGLE_K - 1), 1)
            dis[i] = len(_token_hashes(t))
        return pa.table({
            "doc_id": pa.array(ids),
            "n_shingles": pa.array(tot),
            "n_distinct": pa.array(dis),
            "rep_milli": pa.array(1000 * (tot - dis) // tot),
        })


class SimHasher:
    """64-bit SimHash over shingle hashes; emits 4x16-bit LSH segments.

    The 64 vote bits per shingle come from three LCG mixes of the
    31-bit shingle hash (31 + 31 + 2 bits), so every bit is exactly
    SQL-expressible; the assembled simhash is emitted as the
    two's-complement int64 bit pattern (BIGINT-comparable)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        out = np.empty(len(ids), dtype=np.uint64)
        M = np.uint64(MERSENNE)
        shifts = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = _token_hashes(t).astype(np.uint64)
            g1 = (sh * np.uint64(SIM_G1) + np.uint64(SIM_H1)) % M
            g2 = (sh * np.uint64(SIM_G2) + np.uint64(SIM_H2)) % M
            g3 = (sh * np.uint64(SIM_G3) + np.uint64(SIM_H3)) % M
            vb = g1 | (g2 << np.uint64(31)) | ((g3 & np.uint64(3))
                                               << np.uint64(62))
            bits = ((vb[:, None] >> shifts[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = np.bitwise_or.reduce(
                (vote > 0).astype(np.uint64) << shifts)
        tbl = {"doc_id": pa.array(ids),
               "simhash": pa.array(out.view(np.int64))}
        for s in range(SIM_SEGS):
            seg = (out >> np.uint64(16 * s)) & np.uint64(0xFFFF)
            tbl[f"seg{s}"] = pa.array(seg.astype(np.int64))
        return pa.table(tbl)


def simhash_table(ds):
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 4))
