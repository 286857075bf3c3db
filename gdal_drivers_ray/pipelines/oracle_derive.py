"""Driver-side straight-line re-derivations that turn the remaining
rows-only queries into hash-checkable SQL oracles.

Pattern (established by blend_queries/_sql_lod_pyramid and blessed in
round-2 review): the oracle may REUSE the pure per-record kernels
(MinHasher.signature, simhash64, hyperplanes, train_centroids — all
deterministic, seeded, single-doc/-vector functions), but re-derives the
result with plain in-memory NumPy/dict code. Everything DISTRIBUTED —
actor-pool batching, the (band, hash) hash-partition shuffle, the
worker-task/label-propagation cluster assembly, CSR candidate expansion,
partial top-k exchanges, persisted-index pruning — plays no part in
producing these numbers, so a drift anywhere in that machinery
hash-fails the gate.

All derivations are pinned to the gate's sf0.01 tables (precedent:
SQL_PHASH_DEDUP / SQL_IMAGES_PARENT_ROLLUP).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

_SF = "/root/testdata/sf0.01"


def _values_sql(rows: list[str], cols: str, select: str) -> str:
    # the leading comment marks these oracles as PINNED to the gate's
    # sf0.01 fixture: check_oracle downgrades them to rows-only at any
    # other sf instead of comparing against the wrong-scale derivation
    values = ",\n    ".join(rows)
    return ("-- derived in-memory from the sf0.01 gate fixture\n"
            f"SELECT {select}\nFROM (VALUES {values}) t({cols})\n")


def _cluster_sql(pairs: list[tuple[int, int]], ids: np.ndarray) -> str:
    from ..stages.dedup import clusters_from_pairs

    df = clusters_from_pairs(ids, pairs)
    rows = [f"({int(d)}, {int(c)}, {'TRUE' if k else 'FALSE'})"
            for d, c, k in zip(df["doc_id"], df["cluster_id"],
                               df["is_keeper"])]
    return _values_sql(
        rows, "doc_id, cluster_id, is_keeper",
        "CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(cluster_id AS BIGINT) AS cluster_id, is_keeper")


def sql_minhash_dedup(sf_dir: str = _SF) -> str:
    """In-memory minhash-LSH: per-doc signatures via the pure kernel, a
    plain dict of (band, band_hash) buckets, per-bucket signature-
    similarity verify, in-memory union-find. The Ray side's shuffle,
    bucket capping inside hash partitions, and distributed min-label
    propagation must reach the identical cluster table."""
    import hashlib

    from ..stages.dedup import MinHasher

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    hasher = MinHasher(64, 16)
    buckets: dict[tuple[int, int], list[int]] = {}
    sigs: dict[int, np.ndarray] = {}
    for did, text in zip(ids.tolist(), t["text"].to_pylist()):
        sig = hasher.signature(text)
        sigs[did] = sig
        sb = sig.reshape(hasher.bands, hasher.rows)
        for bi in range(hasher.bands):
            bh = int.from_bytes(
                hashlib.blake2b(sb[bi].tobytes(), digest_size=8).digest(),
                "little", signed=True)
            buckets.setdefault((bi, bh), []).append(did)
    pairs = []
    for members in buckets.values():
        u = sorted(set(members))
        if len(u) < 2 or len(u) > 64:          # max_bucket cap
            continue
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                est = float((sigs[u[i]] == sigs[u[j]]).mean())
                if est >= 0.7:
                    pairs.append((u[i], u[j]))
    return _cluster_sql(pairs, ids)


def sql_simhash_dedup(sf_dir: str = _SF) -> str:
    """In-memory simhash banding (4 x 16-bit) + Hamming<=3 verify +
    union-find, from the pure simhash64 kernel."""
    from ..stages.dedup import simhash64

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    hs = {int(d): simhash64(s) for d, s in
          zip(ids.tolist(), t["text"].to_pylist())}
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, h in hs.items():
        hu = h & ((1 << 64) - 1)
        for bi in range(4):
            buckets.setdefault((bi, (hu >> (bi * 16)) & 0xFFFF),
                               []).append(did)
    pairs = []
    for members in buckets.values():
        u = sorted(set(members))
        if len(u) < 2 or len(u) > 256:         # max_bucket cap
            continue
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                x = (hs[u[i]] ^ hs[u[j]]) & ((1 << 64) - 1)
                if bin(x).count("1") <= 3:
                    pairs.append((u[i], u[j]))
    return _cluster_sql(pairs, ids)


def _load_embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(e, np.float64)
                    for e in t["embedding"].to_pylist()])
    return ids, mat


def _topk_rank_rows(qids, per_query_ids, per_query_sims, k=10):
    rows = []
    for qi, qid in enumerate(qids):
        nid = per_query_ids[qi]
        sims = per_query_sims[qi]
        order = np.lexsort((nid, -sims))[:k]
        for rank, ji in enumerate(order, start=1):
            rows.append(f"({int(qid)}, {int(nid[ji])}, {rank})")
    return rows


_ANN_SELECT = ("CAST(query_id AS BIGINT) AS query_id, "
               "CAST(neighbor_id AS BIGINT) AS neighbor_id, "
               "CAST(rank AS BIGINT) AS rank")


def sql_ann_lsh(sf_dir: str = _SF) -> str:
    """Plain-loop LSH re-derivation of q_ann_lsh (n_bits=4, multiprobe=2,
    k=10): bucket every candidate, accept each query's bucket plus all
    1- and 2-bit flips, exact cosine on accepted candidates, top-10 by
    (sim desc, id asc). No CSR, no partial top-k, no shuffle."""
    from ..stages.dedup import hyperplanes

    ids, mat = _load_embeddings(sf_dir)
    qm = mat[ids < 5]
    qids = ids[ids < 5]
    cand_ids = ids[ids >= 5]
    cand = mat[ids >= 5]
    cand_n = cand / np.maximum(
        np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    planes = hyperplanes(64, 4)

    def bucket(v):
        bits = (v @ planes.T) > 0
        out = np.zeros(len(v), dtype=np.int64)
        for i in range(planes.shape[0]):
            out |= bits[:, i].astype(np.int64) << i
        return out

    cb = bucket(cand_n)
    qb = bucket(qn)
    per_ids, per_sims = [], []
    for qi in range(len(qids)):
        acc = {int(qb[qi])}
        acc |= {int(qb[qi]) ^ (1 << i) for i in range(4)}
        acc |= {int(qb[qi]) ^ (1 << i) ^ (1 << j)
                for i in range(4) for j in range(i + 1, 4)}
        m = np.isin(cb, list(acc))
        per_ids.append(cand_ids[m])
        per_sims.append(cand_n[m] @ qn[qi])
    return _values_sql(_topk_rank_rows(qids, per_ids, per_sims),
                       "query_id, neighbor_id, rank", _ANN_SELECT)


def sql_audio_features(n: int = 200) -> str:
    """Straight-line re-derivation of q_audio_features at the gate's
    sf0.01 size (n=200): regenerate each clip's samples with the same
    seeded rng calls, apply the 16-bit PCM quantize/dequantize INLINE
    (round(clip(s)*32767)/32768 — the WAV container round-trip is thereby
    independently cross-checked, stdlib wave never runs here), and compute
    the features with the same float64 expressions. The actor-pool decode
    stage and the real container parse must reproduce every float bit."""
    rows = []
    sr = 16000
    for i in range(n):
        rng = np.random.default_rng([7, i])
        ns = int(rng.integers(1600, 24000))
        if i % 5 == 4:
            payload = rng.bytes(64)
            import hashlib
            seed = int.from_bytes(
                hashlib.blake2b(payload, digest_size=8).digest(), "little")
            s = np.random.default_rng(seed).uniform(-1.0, 1.0, ns)
        else:
            t = np.arange(ns) / sr
            freq = float(rng.uniform(100, 2000))
            amp = float(rng.uniform(0.2, 0.9))
            raw = amp * np.sin(2 * np.pi * freq * t) \
                + 0.02 * rng.standard_normal(ns)
            pcm16 = np.round(np.clip(raw, -1.0, 1.0) * 32767.0) \
                .astype("<i2")
            s = pcm16.astype(np.float64) / 32768.0
        m = len(s)
        rms = float(np.sqrt(np.mean(s ** 2)))
        peak = float(np.abs(s).max())
        zcr = float((np.diff(np.signbit(s)) != 0).mean())
        n_frames = -(-m // 400)          # frame = 16000 * 25ms / 1000
        dur = m / sr

        # string-parsed doubles: a bare decimal literal in VALUES is typed
        # DECIMAL and the decimal->double cast rounds TWICE (measured
        # 1-ulp drift); VARCHAR->DOUBLE parse is correctly rounded
        def d(x: float) -> str:
            return f"CAST('{x!r}' AS DOUBLE)"

        rows.append(f"('clip-{i:06d}', {d(dur)}, {d(rms)}, {d(peak)}, "
                    f"{d(zcr)}, {n_frames})")
    return _values_sql(
        rows, "clip_id, duration_s, rms, peak, zero_cross_rate, n_frames",
        "clip_id, duration_s, rms, peak, zero_cross_rate, "
        "CAST(n_frames AS INTEGER) AS n_frames")


def sql_video_frames(n: int = 100) -> str:
    """Closed-form re-derivation of q_video_frames: per fixture video the
    frame count is the seeded rng draw and the sampler takes every 30th
    frame, so n_frames = ceil(nf/30) — for BOTH the real Y4M container
    parse and the mp4 stub path."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng([11, i])
        nf = int(rng.integers(30, 120))
        rows.append(f"('vid-{i:06d}', {-(-nf // 30)})")
    return _values_sql(
        rows, "video_id, n_frames",
        "video_id, CAST(n_frames AS BIGINT) AS n_frames")


def sql_ann_ivf(sf_dir: str = _SF) -> str:
    """Plain-loop IVF re-derivation of q_ann_ivf / q_ann_ivf_indexed
    (n_cells=8, n_probe=4, k=10). Replicates the deterministic sampling
    contract of _train_from_dataset (hash-mod filter in row order, first
    sample_n) and the pure train_centroids kernel, then assigns cells and
    searches probed cells with one flat loop. The persisted-index path
    (bounded cell files + manifest pruning) must agree row-for-row."""
    from ..stages.ann import train_centroids

    ids, mat = _load_embeddings(sf_dir)
    qm = mat[ids < 5]
    qids = ids[ids < 5]
    cand_ids = ids[ids >= 5]
    cand = mat[ids >= 5]

    # sampling contract: rate = min(1, 2*2048/n); mod = round(1/rate);
    # keep (id * 2654435761) % mod == 0 in row order, first 2048
    n_total = max(len(cand_ids), 1)
    rate = min(1.0, (2.0 * 2048) / n_total)
    mod = max(int(round(1.0 / rate)), 1)
    with np.errstate(over="ignore"):
        keep = (cand_ids * np.int64(2654435761)) % np.int64(mod) == 0
    sample = cand[keep][:2048]
    cent = train_centroids(sample, 8)

    cand_n = cand / np.maximum(
        np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(cand_n @ cent.T, axis=1)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :4]
    per_ids, per_sims = [], []
    for qi in range(len(qids)):
        m = np.isin(cells, probe[qi])
        per_ids.append(cand_ids[m])
        per_sims.append(cand_n[m] @ qn[qi])
    return _values_sql(_topk_rank_rows(qids, per_ids, per_sims),
                       "query_id, neighbor_id, rank", _ANN_SELECT)


_IMAGES_GATE_N, _IMAGES_GATE_LOD = 4000, 6


def _images_gate_decode():
    """One straight-line codec round-trip over the gate's images fixture
    (n=4000, lod=6): per-row phash-invariant verdict and DECODED pixel
    sum, computed with the pure per-record kernels (fixtures.image_row,
    codecs.decode_image/phash64). The jpeg stand-in is lossy, so decoded
    sums and phash distances genuinely differ from the stored originals —
    the oracle must take the same round-trip the pipeline takes. Cached:
    both image oracles share one pass."""
    global _IMAGES_GATE_CACHE
    try:
        return _IMAGES_GATE_CACHE
    except NameError:
        pass
    from .. import codecs, fixtures

    n = _IMAGES_GATE_N
    ok = np.empty(n, dtype=bool)
    sums = np.empty(n, dtype=np.int64)
    for i in range(n):
        r = fixtures.image_row(i, _IMAGES_GATE_LOD)
        px = codecs.decode_image(r["bytes"])
        ph = codecs.phash64(px)
        d = bin(int(np.int64(ph).view(np.uint64)
                    ^ np.int64(r["phash"]).view(np.uint64))).count("1")
        ok[i] = (d == 0) if r["fmt"] == "png" else (d <= 4)
        sums[i] = int(px.sum(dtype=np.int64))
    _IMAGES_GATE_CACHE = (ok, sums)
    return _IMAGES_GATE_CACHE


def sql_images_flagship() -> str:
    """Parquet-based flagship oracle: DuckDB recomputes the tile address
    from image_id and the caption check from the caption string itself;
    the lossless phash is pinned to the parquet's stored column; the
    lossy-row phash verdicts come from the straight-line codec
    round-trip above (at this fixture two jpeg rows legitimately exceed
    the Hamming<=4 invariant and the pipeline must report them False)."""
    ok, _ = _images_gate_decode()
    false_ids = ", ".join(f"'img-{i:08d}'" for i in np.flatnonzero(~ok))
    ph_ok = (f"(image_id NOT IN ({false_ids}))" if false_ids else "TRUE")
    side = 1 << _IMAGES_GATE_LOD
    return f"""
-- derived in-memory from the sf0.01 gate fixture (codec round-trip)
WITH t AS (
  SELECT image_id, fmt, caption, phash,
         CAST(substring(image_id, 5) AS BIGINT) AS idx
  FROM read_parquet('/tmp/graft_fixtures/sf0.01/images_4000/part-*.parquet')
)
SELECT image_id, fmt,
       CAST({_IMAGES_GATE_LOD} AS BIGINT) AS lod,
       idx % {side} AS tile_x,
       (idx // {side}) % {side} AS tile_y,
       'ok' AS status,
       (caption LIKE 'tile {_IMAGES_GATE_LOD}/' || CAST(idx % {side} AS VARCHAR) || '/'
                 || CAST((idx // {side}) % {side} AS VARCHAR) || ' %')
           AS caption_ok,
       {ph_ok} AS phash_ok,
       CASE WHEN fmt = 'png' THEN phash
            ELSE CAST(-1 AS BIGINT) END AS phash_png
FROM t
"""


def sql_images_lod_rollup() -> str:
    """In-memory re-derivation of the flagship LOD rollup over the gate's
    images fixture (n=4000, lod=6, SQL_IMAGES_PARENT_ROLLUP precedent):
    per-image DECODED brightness from the codec round-trip above, grouped
    by Morton parent cell with plain NumPy. The per-image pixel SUM is an
    exact integer and group sums of sum/65536 are exact multiples of
    2^-16 in float64, so the Ray side's partial-aggregation order cannot
    perturb the hash; the query surface carries px_sum_x65536 (int64) for
    the same reason."""
    from ..grid import cell_id, cell_parent

    _, px_sum = _images_gate_decode()
    n, lod = _IMAGES_GATE_N, _IMAGES_GATE_LOD
    side = 1 << lod
    idx = np.arange(n, dtype=np.int64)
    cells = cell_id(np.full(n, lod, dtype=np.int64),
                    idx % side, (idx // side) % side)
    parents = cell_parent(cells)
    order = np.argsort(parents, kind="stable")
    parents_s = parents[order]
    ps = px_sum[order]
    keys, starts = np.unique(parents_s, return_index=True)
    gsum = np.add.reduceat(ps, starts)
    gcnt = np.diff(np.append(starts, n))
    rows = [f"({int(k)}, {int(c)}, {int(s)})"
            for k, c, s in zip(keys, gcnt, gsum)]
    return _values_sql(rows, "parent_cell, n_tiles, px_sum_x65536",
                       "CAST(parent_cell AS BIGINT) AS parent_cell, "
                       "CAST(n_tiles AS BIGINT) AS n_tiles, "
                       "CAST(px_sum_x65536 AS BIGINT) AS px_sum_x65536")


def sql_image_norm_stats() -> str:
    """Straight-line codec round-trip over the gate's images fixture:
    per-format exact integer pixel moments (n_px, sum, sum of squares)
    plus mean_milli. The distributed plan's per-batch partials +
    groupby(fmt) Sum must reproduce these integers bit-for-bit (uint8
    pixels -> int64-exact in any association order)."""
    from .. import codecs, fixtures

    acc: dict[str, list[int]] = {}
    for i in range(_IMAGES_GATE_N):
        r = fixtures.image_row(i, _IMAGES_GATE_LOD)
        a = codecs.decode_image(r["bytes"]).astype(np.int64)
        st = acc.setdefault(r["fmt"], [0, 0, 0])
        st[0] += int(a.size)
        st[1] += int(a.sum())
        st[2] += int((a * a).sum())
    rows = [f"('{k}', {v[0]}, {v[1]}, {v[2]}, {v[1] * 1000 // v[0]})"
            for k, v in sorted(acc.items())]
    return _values_sql(
        rows, "fmt, n_px, px_sum, px_sumsq, mean_milli",
        "fmt, CAST(n_px AS BIGINT) AS n_px, "
        "CAST(px_sum AS BIGINT) AS px_sum, "
        "CAST(px_sumsq AS BIGINT) AS px_sumsq, "
        "CAST(mean_milli AS BIGINT) AS mean_milli")


def sql_psnr_audit() -> str:
    """Straight-line decode-vs-generator PSNR audit over the gate
    fixture; the distributed per-fmt partials + groupby Sum must
    reproduce these exact integers (and the 40 dB verdicts)."""
    from .. import codecs, fixtures

    acc: dict[str, list[int]] = {}
    for i in range(_IMAGES_GATE_N):
        r = fixtures.image_row(i, _IMAGES_GATE_LOD)
        px = codecs.decode_image(r["bytes"]).astype(np.int64)
        src = i - (i % fixtures.DUP_EVERY == 0 and i > 0) * fixtures.DUP_EVERY
        ref = fixtures.make_tile_pixels(src).astype(np.int64)
        d = px - ref
        sse = int((d * d).sum())
        n = int(d.size)
        st = acc.setdefault(r["fmt"], [0, 0, 0, 0])
        st[0] += 1
        st[1] += n
        st[2] += sse
        st[3] += int(sse * 10000 > 65025 * n)
    rows = [f"('{k}', {v[0]}, {v[1]}, {v[2]}, {v[3]})"
            for k, v in sorted(acc.items())]
    return _values_sql(
        rows, "fmt, n_images, n_px, sse, n_below_bar",
        "fmt, CAST(n_images AS BIGINT) AS n_images, "
        "CAST(n_px AS BIGINT) AS n_px, CAST(sse AS BIGINT) AS sse, "
        "CAST(n_below_bar AS BIGINT) AS n_below_bar")


def sql_semantic_dedup(sf_dir: str = _SF) -> str:
    """Straight-line SemDeDup twin: in-memory Lloyd (shared quantized
    kernel), per-cell argmax assignment, the fixed-order cosine +
    min-label kernel per id-sorted cell. The distributed training
    passes, the assign map and the groupby(cell) shuffle play no part
    in these numbers."""
    from ..stages.semdedup import semantic_dedup_oracle

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    ids = t["vec_id"].to_numpy().astype(np.int64)[order]
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[order]
    vid, cell, lab, keep = semantic_dedup_oracle(ids, vecs, k=8, n_iter=4,
                                                 threshold=0.4)
    rows = [f"({int(v)}, {int(c)}, {int(l)}, "
            f"{'TRUE' if bool(kp) else 'FALSE'})"
            for v, c, l, kp in zip(vid, cell, lab, keep)]
    return _values_sql(
        rows, "vec_id, cell, sem_cluster_id, is_keeper",
        "CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS BIGINT) AS cell, "
        "CAST(sem_cluster_id AS BIGINT) AS sem_cluster_id, is_keeper")


def sql_kmeans_fit(sf_dir: str = _SF) -> str:
    """Straight-line Lloyd over the in-memory embedding matrix (same
    deterministic quantized kernel): the distributed per-iteration
    assign/reduce must land on bit-identical centroids."""
    from ..stages.kmeans import _Q, kmeans_fit_oracle

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[order]
    cent, counts = kmeans_fit_oracle(vecs, k=8, n_iter=4)
    cq = np.round(cent * _Q).astype(np.int64).sum(axis=1)
    rows = [f"({c}, {int(n)}, {int(q)})"
            for c, (n, q) in enumerate(zip(counts, cq))]
    return _values_sql(rows, "cell, n_vecs, cent_q_sum",
                       "CAST(cell AS BIGINT) AS cell, "
                       "CAST(n_vecs AS BIGINT) AS n_vecs, "
                       "CAST(cent_q_sum AS BIGINT) AS cent_q_sum")
