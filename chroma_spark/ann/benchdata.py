"""Seeded SIFT1M-style benchmark corpus + exact ground truth.

The reference's ANN quality bar is SIFT1M — 1,000,000 x 128-d descriptors,
k=100, recall >= 0.95 (`rust/benchmark/src/datasets/sift.rs:104-119`,
`rust/worker/benches/query.rs:144-264`,
`chromadb/test/property/invariants.py:281`). The sandbox has no network, so
we synthesize a corpus with the two properties that actually matter for IVF
recall: *cluster structure* and *low intrinsic dimension*. SIFT descriptors
concentrate around visual-word modes that live on a low-dimensional
manifold — a full-rank uniform mixture in 128-d is a degenerate proxy
(random centers there are all nearly equidistant, so either every top-k
neighborhood sits wholly inside one mode, recall trivially 1.0, or the data
is structureless and IVF can't work at all). We therefore draw from a
seeded mixture of Gaussians whose `N_CENTERS` modes live in an
`INTRINSIC_DIM`-dimensional random subspace, with in-subspace noise sized
so clusters *overlap* their nearest neighbors (same-mode point spread ~
nearest-inter-mode distance) — queries near list boundaries exist, and the
recall-vs-nprobe curve is non-trivial, like the real dataset's.

Determinism: the corpus is generated in fixed-size chunks, each chunk from
`np.random.default_rng([seed, chunk_idx])` — byte-identical across runs and
machines regardless of how Spark later partitions the parquet. A params
marker file makes regeneration idempotent.

Ground truth is exact float top-k computed driver-side with numpy (chunked
GEMM) — the *oracle* for recall, deliberately outside the system under
test. The Spark searches being graded never see it.
"""

from __future__ import annotations

import json
import os

N_CENTERS = 2048
INTRINSIC_DIM = 16
CENTER_SCALE = 100.0  # mode spread in the intrinsic subspace
SIGMA_Z = 55.0  # in-subspace noise: ~ nearest-inter-mode distance -> overlap
SIGMA_A = 4.0  # small ambient (off-manifold) noise
CHUNK = 50_000


def _chunk_rng(seed: int, chunk_idx: int):
    import numpy as np

    return np.random.default_rng([seed, chunk_idx])


def _model(seed: int, dim: int, n_centers: int = N_CENTERS):
    """(centers_z, P): mode centers in the intrinsic subspace + an
    orthonormal embedding of that subspace into ambient `dim`-space."""
    import numpy as np

    rng = np.random.default_rng([seed, 999_983])
    centers_z = rng.normal(0.0, CENTER_SCALE, size=(n_centers, INTRINSIC_DIM))
    q, _ = np.linalg.qr(rng.normal(size=(dim, INTRINSIC_DIM)))
    return centers_z, q.T  # P: (INTRINSIC_DIM, dim), rows orthonormal


def _draw(rng, model, n: int):
    """n points: pick a mode, wander SIGMA_Z in-subspace, embed, add a
    little ambient noise."""
    import numpy as np

    centers_z, p = model
    which = rng.integers(0, len(centers_z), size=n)
    z = centers_z[which] + rng.normal(0.0, SIGMA_Z, size=(n, centers_z.shape[1]))
    y = z @ p + rng.normal(0.0, SIGMA_A, size=(n, p.shape[1]))
    return (128.0 + y).astype(np.float32)


def _marker_ok(path: str, params: dict) -> bool:
    marker = os.path.join(path, "_PARAMS.json")
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        return json.load(f) == params


def _write_marker(path: str, params: dict) -> None:
    with open(os.path.join(path, "_PARAMS.json"), "w") as f:
        json.dump(params, f)


def gen_corpus(path: str, n: int, dim: int = 128, seed: int = 7) -> None:
    """Write `(id BIGINT, embedding ARRAY<FLOAT>)` parquet chunks under
    `path`. Idempotent for identical params."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    params = {"n": n, "dim": dim, "seed": seed, "centers": N_CENTERS,
              "r": INTRINSIC_DIM, "sz": SIGMA_Z, "sa": SIGMA_A}
    if _marker_ok(path, params):
        return
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.remove(os.path.join(path, f))
    model = _model(seed, dim)
    schema = pa.schema(
        [pa.field("id", pa.int64()), pa.field("embedding", pa.list_(pa.float32()))]
    )
    for ci, start in enumerate(range(0, n, CHUNK)):
        m = min(CHUNK, n - start)
        vecs = _draw(_chunk_rng(seed, ci), model, m)
        ids = np.arange(start, start + m, dtype=np.int64)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), dim).cast(
            pa.list_(pa.float32())
        )
        tbl = pa.Table.from_arrays([pa.array(ids), emb], schema=schema)
        pq.write_table(tbl, os.path.join(path, f"part-{ci:05d}.parquet"))
    _write_marker(path, params)


def gen_queries(path: str, nq: int, dim: int = 128, seed: int = 7) -> None:
    """Queries drawn from the same mixture (like real query sets), offset
    chunk index so they never collide with corpus draws."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    params = {"nq": nq, "dim": dim, "seed": seed, "centers": N_CENTERS,
              "r": INTRINSIC_DIM, "sz": SIGMA_Z, "sa": SIGMA_A}
    if _marker_ok(path, params):
        return
    os.makedirs(path, exist_ok=True)
    vecs = _draw(_chunk_rng(seed, 1_000_003), _model(seed, dim), nq)
    emb = pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), dim).cast(
        pa.list_(pa.float32())
    )
    tbl = pa.Table.from_arrays(
        [pa.array(np.arange(nq, dtype=np.int64)), emb],
        schema=pa.schema(
            [pa.field("query_id", pa.int64()), pa.field("embedding", pa.list_(pa.float32()))]
        ),
    )
    pq.write_table(tbl, os.path.join(path, "queries.parquet"))
    _write_marker(path, params)


def _load_matrix(path: str, vec_col: str):
    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    ids, mats = [], []
    for f in files:
        t = pq.read_table(f)
        ids.append(t.column(0).to_numpy())
        flat = t.column(vec_col).combine_chunks()
        arr = np.asarray(flat.flatten(), dtype=np.float32)
        mats.append(arr.reshape(len(t), -1))
    return np.concatenate(ids), np.vstack(mats)


def ground_truth(
    corpus_path: str, queries_path: str, k: int = 100,
    id_mod: "tuple[int, int] | None" = None,
) -> "dict[int, list[int]]":
    """Exact l2 top-k ids per query (ties by id asc, matching the engine's
    determinism rule), cached next to the queries.

    ``id_mod=(m, r)`` restricts the corpus to ids with ``id % m < r`` —
    the exact oracle for FILTERED (filter-before-ANN) recall, matching the
    reference's filtered ann_accuracy invariant
    (chromadb/test/property/invariants.py filtered queries)."""
    import numpy as np

    tag = f"_mod{id_mod[0]}_{id_mod[1]}" if id_mod else ""
    cache = os.path.join(queries_path, f"gt{k}{tag}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return {int(q): ids for q, ids in json.load(f).items()}
    ids, x = _load_matrix(corpus_path, "embedding")
    if id_mod is not None:
        mask = (ids % id_mod[0]) < id_mod[1]
        ids, x = ids[mask], x[mask]
    _, q = _load_matrix(queries_path, "embedding")
    xf = x.astype(np.float32)
    qf = q.astype(np.float32)
    q2 = np.einsum("ij,ij->i", qf.astype(np.float64), qf.astype(np.float64))
    out: dict[int, list[int]] = {}
    # chunk over the corpus; keep a running candidate pool per query
    best_d = np.full((len(qf), k), np.inf, dtype=np.float64)
    best_i = np.full((len(qf), k), -1, dtype=np.int64)
    step = 200_000
    for s in range(0, len(xf), step):
        xc = xf[s : s + step].astype(np.float64)
        x2 = np.einsum("ij,ij->i", xc, xc)
        d = q2[:, None] - 2.0 * (qf.astype(np.float64) @ xc.T) + x2[None, :]
        np.maximum(d, 0.0, out=d)
        cid = ids[s : s + step]
        # cheap pre-cut: argpartition the chunk to 4k candidates by raw
        # distance, then resolve (rounded dist, id asc) ties on the small pool
        pool = min(4 * k, d.shape[1])
        part = np.argpartition(d, pool - 1, axis=1)[:, :pool]
        dpool = np.take_along_axis(d, part, axis=1)
        ipool = np.broadcast_to(cid, (len(qf), len(cid)))
        ipool = np.take_along_axis(ipool, part, axis=1)
        alld = np.concatenate([best_d, dpool], axis=1)
        alli = np.concatenate([best_i, ipool], axis=1)
        order = np.lexsort((alli, np.round(alld, 6)), axis=1)[:, :k]
        best_d = np.take_along_axis(alld, order, axis=1)
        best_i = np.take_along_axis(alli, order, axis=1)
    for qi in range(len(qf)):
        out[qi] = [int(v) for v in best_i[qi]]
    with open(cache, "w") as f:
        json.dump({str(q): v for q, v in out.items()}, f)
    return out


def recall_against_gt(
    rows, gt: "dict[int, list[int]]", k: int, query_ids: "set[int] | None" = None
) -> float:
    """Recall@k of collected `(query_id, id, rank)` rows vs the exact
    ground-truth id lists (invariants.py:277-300 `ann_accuracy` shape)."""
    got: dict[int, set] = {}
    for r in rows:
        if r["rank"] <= k:
            got.setdefault(int(r["query_id"]), set()).add(int(r["id"]))
    qids = query_ids if query_ids is not None else set(got)
    hit = total = 0
    for q in qids:
        truth = gt[q][:k]
        total += len(truth)
        hit += len(set(truth) & got.get(q, set()))
    return hit / max(1, total)
