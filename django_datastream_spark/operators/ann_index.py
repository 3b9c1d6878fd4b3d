"""Persistent ANN index tier — build-once / query-many.

The in-module ANN operators (:mod:`.similarity`) retrain their IVF
centroids / PQ codebooks per call, which is the right shape for a gate
query but not for a 100 TB embedding tier: there the index is built
ONCE (hours of cluster time), then served for months of queries and
grown incrementally as new vectors arrive. This module makes that
state durable through the engine's own transaction log
(:mod:`..txnlog`), so index versions are commits and time travel over
corpus growth is free:

- ``build_ann_index(root, corpus)`` trains (or accepts) IVF centroids
  + PQ codebooks and commits TWO txn tables under ``root``:

  * ``root/model`` — the small trained state: one row per codeword /
    centroid (+ one meta row with the index parameters). A few
    thousand rows; read driver-side and broadcast at query time.
  * ``root/codes`` — one row per corpus vector: ``(vec_id, cell,
    code binary)`` where ``code`` is the vector's ``m`` uint8 PQ
    codes packed as bytes (dim*4/m compression: 128-dim float32 →
    8 bytes at m=8 — the reason 100 TB of embeddings fits an ANN
    tier at all). PARTITIONED BY ``cell``, so an ``n_probe``-cell
    query prunes to n_probe/n_cells of the FILES through the txn
    log's partition + stats skipping before Spark sees a byte.

- ``query_ann_index(root, queries, k)`` loads the model (small
  collect), prunes the codes table to the probed cells via
  ``txn_read(where=...)``, and LUT/ADC-scores one Arrow pass emitting
  per-batch top-k — NO retraining, no raw-vector scan.

- ``add_vectors(root, new)`` encodes new vectors with the PERSISTED
  model and appends a codes commit — the incremental-growth story.
  Every ``codes`` commit is a queryable index version:
  ``query_ann_index(..., version=v)`` serves the index exactly as of
  commit ``v`` (and ``index_versions(root)`` lists them).

Scale notes (the 100 TB lens): train is bounded-sample (identical
contract to :func:`.similarity.pq_train_codebooks`); encode is one
map-side Arrow matmul pass, no shuffle; the query-side collect is
bounded by API contract (the eval side of ANN, same as the brute
baseline); the codes scan reads only probed-cell partitions and emits
``batches * queries * k`` rows into one final exact top-k.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import txnlog as TL
from . import similarity as sim

#: model-table row kinds
_K_META = "meta"
_K_CENTROID = "centroid"
_K_CODEBOOK = "codebook"

_MODEL_SCHEMA = "kind string, i int, j int, vec array<double>"
_CODES_SCHEMA = "vec_id long, cell int, code binary"


def model_root(root: str) -> str:
    return os.path.join(root, "model")


def codes_root(root: str) -> str:
    return os.path.join(root, "codes")


class AnnModel:
    """Driver-side handle on the persisted trained state: plain nested
    lists (exactly what :func:`.similarity.pq_train_codebooks` /
    ``_ivf_centroids`` return), plus the index parameters."""

    def __init__(self, codebooks, centroids, residual: bool):
        self.codebooks = codebooks
        self.centroids = centroids  # [] for a flat (non-IVF) index
        self.residual = bool(residual)
        self.m = len(codebooks)
        self.dsub = len(codebooks[0][0])
        self.dim = self.m * self.dsub
        self.n_codes = len(codebooks[0])
        self.n_cells = len(centroids)
        if self.n_codes > 256:
            raise ValueError(
                f"n_codes={self.n_codes} > 256: codes are stored as "
                "uint8 bytes; use <= 256 codewords per subspace"
            )
        if self.residual and not self.centroids:
            raise ValueError("residual index requires IVF centroids")


def _encode_codes_df(
    vectors: DataFrame, model: AnnModel, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec) -> (vec_id, cell, code binary): cell assignment +
    PQ encode in ONE Arrow pass, map-side, no shuffle. ``code`` packs
    the m uint8 nearest-codeword ids as bytes."""
    books = model.codebooks
    cents = model.centroids
    residual = model.residual
    dim = model.dim

    def run(batches):
        import numpy as np
        import pandas as pd

        B = [np.array(b, np.float64) for b in books]
        C = np.array(cents, np.float64) if cents else None
        m = len(B)
        dsub = B[0].shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["_v"]), np.float64)
            if X.ndim != 2 or X.shape[1] != dim:
                raise ValueError(
                    f"vector dim {X.shape[-1] if X.ndim == 2 else '?'} "
                    f"!= index dim {dim}"
                )
            if C is not None:
                d = ((X[:, None, :] - C[None]) ** 2).sum(-1)
                cell = d.argmin(1)
            else:
                cell = np.zeros(len(X), np.int64)
            V = X - C[cell] if residual else X
            codes = np.empty((len(V), m), np.uint8)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                dd = -2 * sub @ B[j].T + (B[j] ** 2).sum(1)[None, :]
                codes[:, j] = dd.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["_id"],
                    "cell": cell.astype(np.int32),
                    "code": [c.tobytes() for c in codes],
                }
            )

    src = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    return src.mapInPandas(run, _CODES_SCHEMA)


def build_ann_index(
    spark: SparkSession,
    root: str,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    n_cells: int = 0,
    residual: bool = False,
    codebooks=None,
    centroids=None,
    seed: int = 42,
    max_train_rows: int = 16_384,
    writer: str = "",
) -> int:
    """Train (bounded sample) or accept centroids/codebooks, commit
    the model table, encode the corpus, and commit the codes table
    partitioned by cell. Returns the codes-table version (the first
    queryable index version). ``root`` must not already hold an index
    — an index is immutable once built except for :func:`add_vectors`
    appends; rebuild into a fresh root (cheap: roots are just paths)."""
    if TL.is_txn_table(model_root(root)):
        raise ValueError(
            f"{root}: already holds an ANN index; build into a fresh "
            "root (indexes grow via add_vectors, never retrain in place)"
        )
    if centroids is None and n_cells > 0:
        ml_src = corpus.select(
            F.col(vec_col).cast("array<double>").alias("_cv")
        )
        centroids = sim._ivf_centroids(
            ml_src, n_cells, seed, max_train_rows
        )
    if codebooks is None:
        codebooks = sim.pq_train_codebooks(
            corpus, m=m, n_codes=n_codes, vec_col=vec_col, seed=seed,
            max_train_rows=max_train_rows,
        )
    model = AnnModel(codebooks, centroids or [], residual)

    rows = [(_K_META, int(model.residual), 0,
             [float(model.m), float(model.n_codes),
              float(model.n_cells), float(model.dim)])]
    for jsub, book in enumerate(model.codebooks):
        for c, vec in enumerate(book):
            rows.append((_K_CODEBOOK, jsub, c, [float(x) for x in vec]))
    for c, vec in enumerate(model.centroids):
        rows.append((_K_CENTROID, c, 0, [float(x) for x in vec]))
    from ..storage import local_rows_df

    mdf = local_rows_df(spark, rows, _MODEL_SCHEMA).coalesce(1)
    TL.txn_append(spark, mdf, model_root(root), [], writer=writer)

    codes = _encode_codes_df(corpus, model, id_col, vec_col)
    return TL.txn_append(
        spark, codes, codes_root(root), ["cell"], writer=writer
    )


def load_ann_model(
    spark: SparkSession, root: str, version: int | None = None
) -> AnnModel:
    """Reload the trained state from the model table (small collect;
    ``version`` time-travels a re-committed model, normally 1)."""
    rows = TL.txn_read(
        spark, model_root(root), version=version
    ).collect()
    meta = books = cents = None
    book_rows, cent_rows = [], []
    for r in rows:
        if r["kind"] == _K_META:
            meta = (int(r["vec"][0]), int(r["vec"][1]),
                    int(r["vec"][2]), int(r["vec"][3]), bool(r["i"]))
        elif r["kind"] == _K_CODEBOOK:
            book_rows.append((r["i"], r["j"], r["vec"]))
        elif r["kind"] == _K_CENTROID:
            cent_rows.append((r["i"], r["vec"]))
    if meta is None:
        raise ValueError(f"{root}: no ANN model meta row")
    m, n_codes, n_cells, _dim, residual = meta
    books = [[None] * n_codes for _ in range(m)]
    for i, j, vec in book_rows:
        books[i][j] = [float(x) for x in vec]
    cents = [None] * n_cells
    for i, vec in cent_rows:
        cents[i] = [float(x) for x in vec]
    if any(v is None for b in books for v in b) or any(
        v is None for v in cents
    ):
        raise ValueError(f"{root}: ANN model table is incomplete")
    return AnnModel(books, cents, residual)


def add_vectors(
    spark: SparkSession,
    root: str,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    writer: str = "",
    model: AnnModel | None = None,
) -> int:
    """Encode ``new_vectors`` with the PERSISTED model (no retrain) and
    append them as a codes commit. Returns the new index version.

    ``model``: an :class:`AnnModel` already reloaded from THIS root —
    the model table is immutable after build, so callers serving several
    operations against one index pass the single disk reload through
    instead of re-collecting it per call (r12, guide §1.2: don't
    recompute what you already hold)."""
    model = model or load_ann_model(spark, root)
    codes = _encode_codes_df(new_vectors, model, id_col, vec_col)
    return TL.txn_append(
        spark, codes, codes_root(root), ["cell"], writer=writer
    )


def index_versions(spark: SparkSession, root: str) -> list[int]:
    """The queryable index versions (codes-table commit versions)."""
    return list(range(1, TL.latest_version(codes_root(root)) + 1))


def remove_vectors(
    spark: SparkSession, root: str, vec_ids, writer: str = ""
) -> int:
    """DELETE vectors from the index WITHOUT rebuilding it — the
    right-to-be-forgotten path of a 100 TB embedding tier: the codes
    table takes a deletion-vector commit (no uint8 file rewritten;
    see :func:`..txnlog.txn_delete`), queries at the new version stop
    returning the ids immediately, and time travel to pre-delete
    versions still serves them until vacuum. ``vec_ids`` is a bounded
    id list (point deletes) or a Column/SQL condition over the codes
    schema for set deletes. Returns the new index version."""
    from pyspark.sql import Column

    if isinstance(vec_ids, (Column, str)):
        cond = vec_ids
    else:
        ids = [int(i) for i in vec_ids]
        if not ids:
            return TL.latest_version(codes_root(root))
        cond = F.col("vec_id").isin(ids)
    res = TL.txn_delete(spark, codes_root(root), cond, writer=writer)
    return res["version"]


def query_ann_index(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int,
    *,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    version: int | None = None,
    model: AnnModel | None = None,
) -> DataFrame:
    """Serve top-k from the persisted index — no retraining, no raw
    vectors. The codes table is read AT ``version`` (default latest)
    with ``where={'cell': probed}``, so file pruning through the txn
    log's partition values keeps the scan at n_probe/n_cells of the
    corpus. Returns (query_id, rank, neighbor_id, adc_score) — the
    same contract (and, on construction-exact inputs, the same rows)
    as :func:`.similarity.ivfpq_topk`.

    ``model``: optional pre-reloaded :class:`AnnModel` for this root
    (see :func:`add_vectors` — one disk reload can serve many queries;
    ``version`` only time-travels the CODES table, the model table is
    immutable after build)."""
    import numpy as np

    model = model or load_ann_model(spark, root)
    q_rows = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>"),
    ).collect()
    if not q_rows:
        raise ValueError("empty query set")
    B = [np.array(b, np.float64) for b in model.codebooks]
    m, dsub = model.m, model.dsub
    qids = [int(r["qid"]) for r in q_rows]
    Q = np.array([r[1] for r in q_rows], np.float64)
    if Q.shape[1] != model.dim:
        raise ValueError(
            f"query dim {Q.shape[1]} != index dim {model.dim}"
        )
    luts = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ B[j].T for j in range(m)],
        axis=1,
    )
    if model.n_cells and n_probe is not None:
        C = np.array(model.centroids, np.float64)
        dq = ((Q[:, None, :] - C[None]) ** 2).sum(-1)
        probes = np.argsort(dq, axis=1, kind="stable")[:, :n_probe]
        probe_sets = [set(int(c) for c in row) for row in probes]
        qc_dot = Q @ C.T
        all_probed = sorted({c for s in probe_sets for c in s})
        where = {"cell": all_probed}
    else:
        probe_sets = None
        qc_dot = (
            Q @ np.array(model.centroids, np.float64).T
            if model.n_cells else None
        )
        where = None
    residual = model.residual
    coded = TL.txn_read(
        spark, codes_root(root), version=version, where=where
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Cd = np.stack(
                [np.frombuffer(b, np.uint8) for b in pdf["code"]]
            ).astype(np.int64)
            ids = pdf["vec_id"].to_numpy()
            cell = pdf["cell"].to_numpy()
            scores = np.zeros((len(qids), len(Cd)))
            for j in range(m):
                scores += luts[:, j, :][:, Cd[:, j]]
            if residual:
                scores += qc_dot[:, cell]
            rows = []
            for qi, qid in enumerate(qids):
                if probe_sets is not None:
                    mask = np.isin(cell, list(probe_sets[qi]))
                else:
                    mask = np.ones(len(ids), bool)
                if exclude_self:
                    mask &= ids != qid
                cand_ids = ids[mask]
                cand_s = scores[qi][mask]
                if not len(cand_ids):
                    continue
                # total order (score desc, id asc): batch winners are
                # row-order independent, so the persisted scan's cell-
                # partitioned batching selects the SAME tied candidates
                # as an id-ordered inline scan
                top = np.lexsort((cand_ids, -cand_s))[:k]
                for t in top:
                    rows.append(
                        {
                            "query_id": qid,
                            "neighbor_id": int(cand_ids[t]),
                            "adc_score": float(cand_s[t]),
                        }
                    )
            yield pd.DataFrame(rows)

    partial = coded.mapInPandas(
        run, "query_id long, neighbor_id long, adc_score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_score")
    )


def query_ann_index_distributed(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    k: int,
    *,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    version: int | None = None,
) -> DataFrame:
    """CORPUS-SCALE serving: the query side stays a DataFrame end to
    end — NO driver collect — so index-to-index jobs (full-corpus
    top-k for SemDeDup, recall evaluation over the whole corpus) run
    as one distributed DAG. :func:`query_ann_index` remains the
    bounded-query serving/eval path (and keeps its probe-pruned
    FILE-level codes read); this one instead CO-PARTITIONS both sides
    by cell:

    1. map-side: each query assigns to its ``n_probe`` nearest cells
       (``None`` = all cells) carrying only the raw vector — one Arrow
       pass, no shuffle;
    2. the codes table (at ``version``) cogroups with the assignments
       BY CELL — the only shuffle, keyed exactly like the codes
       table's physical partitioning; per group a vectorized
       LUT-build + ADC scan emits each query's within-cell top-k;
    3. one exact global top-k window (score desc, id asc — the same
       total order as the serving path, so both modes return
       IDENTICAL rows on construction-exact fixtures).

    Returns (query_id, rank, neighbor_id, adc_score)."""
    import numpy as np

    model = load_ann_model(spark, root)
    books = model.codebooks
    cents = model.centroids
    residual = model.residual
    m, dsub, dim = model.m, model.dsub, model.dim
    n_cells = model.n_cells

    def assign(batches):
        import pandas as pd

        C = np.array(cents, np.float64) if cents else None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["_v"]), np.float64)
            if X.ndim != 2 or X.shape[1] != dim:
                raise ValueError(
                    f"query dim {X.shape[-1] if X.ndim == 2 else '?'} "
                    f"!= index dim {dim}"
                )
            if C is not None:
                d = ((X[:, None, :] - C[None]) ** 2).sum(-1)
                if n_probe is not None:
                    cells = np.argsort(d, axis=1, kind="stable")[
                        :, :n_probe
                    ]
                else:
                    cells = np.tile(
                        np.arange(n_cells), (len(X), 1)
                    )
            else:
                cells = np.zeros((len(X), 1), np.int64)
            qids = pdf["_id"].to_numpy()
            vecs = list(pdf["_v"])
            out_q, out_c, out_v = [], [], []
            for i in range(len(X)):
                for c in cells[i]:
                    out_q.append(int(qids[i]))
                    out_c.append(int(c))
                    out_v.append(vecs[i])
            yield pd.DataFrame(
                {"qid": out_q, "cell": out_c, "qv": out_v}
            )

    qa = queries.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(assign, "qid long, cell int, qv array<double>")

    coded = TL.txn_read(spark, codes_root(root), version=version)

    def score(key, codes_pdf, q_pdf):
        import pandas as pd

        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "adc_score": pd.Series(dtype="float64"),
            }
        )
        if not len(codes_pdf) or not len(q_pdf):
            return empty
        B = [np.array(b, np.float64) for b in books]
        Cd = np.stack(
            [np.frombuffer(b, np.uint8) for b in codes_pdf["code"]]
        ).astype(np.int64)
        ids = codes_pdf["vec_id"].to_numpy()
        Q = np.array(list(q_pdf["qv"]), np.float64)
        qids = q_pdf["qid"].to_numpy()
        luts = np.stack(
            [
                Q[:, j * dsub : (j + 1) * dsub] @ B[j].T
                for j in range(m)
            ],
            axis=1,
        )
        scores = np.zeros((len(qids), len(Cd)))
        for j in range(m):
            scores += luts[:, j, :][:, Cd[:, j]]
        if residual:
            cvec = np.array(cents, np.float64)[int(key[0])]
            scores += (Q @ cvec)[:, None]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(qids)):
            mask = (
                ids != qids[qi]
                if exclude_self
                else np.ones(len(ids), bool)
            )
            cand_ids = ids[mask]
            cand_s = scores[qi][mask]
            if not len(cand_ids):
                continue
            top = np.lexsort((cand_ids, -cand_s))[:k]
            for t in top:
                rows_q.append(int(qids[qi]))
                rows_n.append(int(cand_ids[t]))
                rows_s.append(float(cand_s[t]))
        return pd.DataFrame(
            {
                "query_id": rows_q,
                "neighbor_id": rows_n,
                "adc_score": rows_s,
            }
        )

    partial = (
        coded.groupBy("cell")
        .cogroup(qa.groupBy("cell"))
        .applyInPandas(
            score, "query_id long, neighbor_id long, adc_score double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_score")
    )


def optimize_index(spark: SparkSession, root: str, **kw) -> dict:
    """INDEX MAINTENANCE: compact the codes table's small commits
    (every :func:`add_vectors` call is one commit → many small files
    per cell over time) via the txn layer's OPTIMIZE. Layout-only
    (``dataChange=false``): answers are unchanged at EVERY version —
    historical snapshots still see their original files, the latest
    reads the compacted layout. Run it per ingest window, like any
    compaction."""
    return TL.txn_optimize(spark, codes_root(root), **kw)


def cell_stats(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The SKEW REPORT: per-cell vector and file counts of the codes
    table (largest first). A drifting corpus concentrates in few cells
    — when the top cell dwarfs the median, queries probing it scan a
    disproportionate share and the documented rebalance path is a
    REBUILD into a fresh root (roots are just paths; build_ann_index
    retrains centroids on the drifted distribution)."""
    coded = TL.txn_read(
        spark, codes_root(root), version=version, keep_meta=True
    )
    return (
        coded.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("__file").alias("n_files"),
        )
        .orderBy(F.desc("n_vectors"), F.asc("cell"))
    )
