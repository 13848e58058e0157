"""Similarity search over embedding columns (north-star, SURVEY.md §2.3).

- ``brute_force_topk``: exact top-k cosine neighbors. The *query* side is
  broadcast (queries are few); the corpus streams through one scan — no
  shuffle of the corpus at all. The baseline every ANN variant is graded
  against.
- ``ivf_topk``: IVF-style approximate top-k: corpus vectors are assigned to
  their nearest coarse centroid (one broadcast join), queries probe only
  their own cell (``nprobe=1``) or the ``nprobe`` nearest cells. Cuts the
  scanned fraction to ~nprobe/n_cells of the corpus at 100 TB while staying
  fully deterministic (centroids are an explicit DataFrame, not trained
  state).
- ``cosine_pairs``: all pairs above a similarity threshold (exact,
  block-nested via broadcast when one side is small).

All scoring runs through ``functions.vectors.cosine_arrow`` — Arrow-batched
numpy einsum in double precision (Spark's interpreted array lambdas are
~100x slower across millions of pairs). A SQL oracle reproduces values to
within float noise; outputs are rounded to 4dp before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_hbase_connector_spark.functions.vectors import cosine_arrow


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Scale shape: the query matrix (queries are few by contract) is
    L2-normalized on the driver and broadcast to every executor; the corpus
    streams through ONE ``mapInPandas`` scan that does a single numpy
    matmul per Arrow batch and keeps only the per-batch top-k candidates
    per query. The final window ranks ~``n_batches x |Q| x k`` candidate
    rows — never the full |corpus| x |Q| score matrix. (The previous shape
    — per-pair scoring through a pandas UDF after a broadcast cross join —
    shipped every corpus vector |Q| times across the Arrow boundary:
    12.0s at sf0.1 vs ~1s for this one.)

    Per-batch top-k uses the same total order as the final window (score
    desc, neighbor_id asc), so the global top-k is always contained in the
    union of batch top-ks — exact, not approximate. Zero-norm or NULL
    vectors never become candidates (documented NULL-cosine semantics).

    Output: (query_id, neighbor_id, score, rank), rank 1..k, deterministic
    tiebreak on neighbor_id.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(q_id, q_vec).collect()  # small side by contract
    qids = [r[0] for r in q_rows]
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    keep = qn > 0
    kept_qids = [i for i, ok in zip(qids, keep) if ok]
    sc = corpus.sparkSession.sparkContext
    # dot/(|a||b|) (not pre-normalized rows) to match the oracle formula
    bq = sc.broadcast((kept_qids, Q[keep], qn[keep]))

    q_type = queries.schema[q_id].dataType.simpleString()
    c_type = corpus.schema[c_id].dataType.simpleString()
    src = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv"))

    def gen(batches):
        b_qids, b_Q, b_qn = bq.value
        m = len(b_qids)
        if m == 0:
            return
        for pdf in batches:
            cids_all = pdf["neighbor_id"]
            vecs = pdf["__cv"]
            rows = [i for i in range(len(pdf)) if vecs.iloc[i] is not None]
            if not rows:
                continue
            C = np.vstack([np.asarray(vecs.iloc[i], dtype=np.float64) for i in rows])
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            ok = cn > 0
            if not ok.any():
                continue
            C = C[ok]
            cids = [cids_all.iloc[rows[i]] for i in np.flatnonzero(ok)]
            S = (C @ b_Q.T) / (cn[ok][:, None] * b_qn[None, :])  # (n_batch, m)
            out_q: list = []
            out_c: list = []
            out_s: list = []
            for j in range(m):
                s = S[:, j]
                if not include_self:
                    mask = np.array([c != b_qids[j] for c in cids])
                    cand = np.flatnonzero(mask)
                else:
                    cand = np.arange(len(cids))
                if len(cand) == 0:
                    continue
                # total order identical to the final window: score desc,
                # neighbor_id asc — batch top-k therefore contains every
                # global top-k row for this query
                order = sorted(cand, key=lambda i: (-s[i], cids[i]))[:k]
                for i in order:
                    out_q.append(b_qids[j])
                    out_c.append(cids[i])
                    out_s.append(s[i])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    scored = src.mapInPandas(
        gen, schema=f"query_id {q_type}, neighbor_id {c_type}, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def filtered_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    q_filter: str = "label",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    c_filter: str = "label",
) -> DataFrame:
    """Exact predicate-constrained top-k cosine neighbors: a corpus vector
    is a candidate for query q only when its ``c_filter`` value equals q's
    ``q_filter`` value (the filtered vector search every metadata-aware
    retrieval system runs — "nearest neighbors WHERE label = ...").

    Scale shape, same architecture as :func:`brute_force_topk` (broadcast
    query matrix, one Arrow matmul pass, per-batch top-k), with the filter
    applied at BOTH ends: the distinct query filter values become an
    ``isin`` predicate pushed into the corpus scan (parquet row-group stats
    prune non-matching data before it is ever read — pre-filtering, not
    the recall-losing post-filter of rank-then-discard), and inside each
    batch a vectorized equality mask restricts the score matrix columns a
    query may rank. Exact by the same containment argument: per-batch
    top-k uses the final window's total order (score desc, neighbor_id
    asc) over exactly the rows that satisfy the predicate."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(q_id, q_vec, q_filter).collect()  # small by contract
    qids = [r[0] for r in q_rows]
    qlabs = [r[2] for r in q_rows]
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    keep = qn > 0
    kept = [(i, l) for i, l, ok in zip(qids, qlabs, keep) if ok]
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((kept, Q[keep], qn[keep]))

    q_type = queries.schema[q_id].dataType.simpleString()
    c_type = corpus.schema[c_id].dataType.simpleString()
    wanted = sorted({l for _, l in kept})
    src = corpus.where(F.col(c_filter).isin(wanted)).select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("__cv"),
        F.col(c_filter).alias("__cl"),
    )

    def gen(batches):
        b_kept, b_Q, b_qn = bq.value
        m = len(b_kept)
        if m == 0:
            return
        for pdf in batches:
            cids_all = pdf["neighbor_id"]
            labs_all = pdf["__cl"]
            vecs = pdf["__cv"]
            rows = [i for i in range(len(pdf)) if vecs.iloc[i] is not None]
            if not rows:
                continue
            C = np.vstack([np.asarray(vecs.iloc[i], dtype=np.float64) for i in rows])
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            ok = cn > 0
            if not ok.any():
                continue
            C = C[ok]
            live = [rows[i] for i in np.flatnonzero(ok)]
            cids = [cids_all.iloc[i] for i in live]
            clabs = [labs_all.iloc[i] for i in live]
            S = (C @ b_Q.T) / (cn[ok][:, None] * b_qn[None, :])
            out_q: list = []
            out_c: list = []
            out_s: list = []
            for j, (qid, qlab) in enumerate(b_kept):
                s = S[:, j]
                cand = [
                    i
                    for i in range(len(cids))
                    if clabs[i] == qlab and cids[i] != qid
                ]
                order = sorted(cand, key=lambda i: (-s[i], cids[i]))[:k]
                for i in order:
                    out_q.append(qid)
                    out_c.append(cids[i])
                    out_s.append(s[i])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    scored = src.mapInPandas(
        gen, schema=f"query_id {q_type}, neighbor_id {c_type}, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    v_id: str = "vec_id",
    v_vec: str = "embedding",
    cent_id: str = "cell_id",
    cent_vec: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine.

    The centroid matrix (small by construction) is collected, L2-handled
    and broadcast to workers; assignment is ONE ``mapInPandas`` scan of the
    vectors with a single numpy matmul per Arrow batch and an in-worker
    top-``nprobe`` selection — zero shuffle, zero row explosion. (The
    previous shape — a vectors x centroids cross join scored by a per-pair
    pandas UDF, then a per-vector window — shipped every vector
    n_centroids times through Arrow and paid a full shuffle for the
    window.) Ties broken on cell_id ascending, matching the SQL oracles.
    """
    import numpy as np
    import pandas as pd

    c_rows = centroids.select(cent_id, cent_vec).collect()  # small side
    cids = [r[0] for r in c_rows]
    C = np.vstack([np.asarray(r[1], dtype=np.float64) for r in c_rows])
    cn = np.sqrt(np.einsum("ij,ij->i", C, C))
    keep = cn > 0
    cids = [i for i, ok in zip(cids, keep) if ok]
    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast((cids, C[keep], cn[keep]))

    v_type = vectors.schema[v_id].dataType.simpleString()
    cell_type = centroids.schema[cent_id].dataType.simpleString()
    src = vectors.select(F.col(v_id).alias("__vid"), F.col(v_vec).alias("__vv"))

    def gen(batches):
        b_cids, b_C, b_cn = bc.value
        m = len(b_cids)
        if m == 0:
            return
        cids_arr = np.asarray(b_cids)
        take = min(nprobe, m)
        # candidate margin: argpartition yields the exact top set BY VALUE
        # but breaks sim-ties arbitrarily at the cut, so keep a margin and
        # fall back to a full lexicographic sort for any row whose selected
        # boundary sim equals the worst candidate sim (only then can an
        # excluded tied cell with a smaller cell_id belong in the top).
        kth = min(nprobe + 16, m - 1)
        for pdf in batches:
            rows = [i for i in range(len(pdf)) if pdf["__vv"].iloc[i] is not None]
            if not rows:
                continue
            V = np.vstack(
                [np.asarray(pdf["__vv"].iloc[i], dtype=np.float64) for i in rows]
            )
            vn = np.sqrt(np.einsum("ij,ij->i", V, V))
            ok = vn > 0
            if not ok.any():
                continue
            V = V[ok]
            vids = [pdf["__vid"].iloc[rows[i]] for i in np.flatnonzero(ok)]
            S = (V @ b_C.T) / (vn[ok][:, None] * b_cn[None, :])
            # total order per row: sim desc, cell_id asc — same as the
            # oracle's row_number window. Vectorized: the per-row Python
            # sorted() over all m cells made assignment O(n*m) in
            # INTERPRETED ops and was 44% of the sf100 LSH-pairs wall.
            cand = np.argpartition(-S, kth, axis=1)[:, : kth + 1]
            ps = np.take_along_axis(S, cand, axis=1)
            # lexsort: last key is primary (sim desc), ties cell_id asc
            order = np.lexsort((cids_arr[cand], -ps), axis=1)[:, :take]
            top_idx = np.take_along_axis(cand, order, axis=1)
            if kth < m - 1:
                sel_last = np.take_along_axis(
                    S, top_idx[:, -1:], axis=1
                ).ravel()
                risky = sel_last <= ps.min(axis=1)
                for r in np.flatnonzero(risky):
                    s = S[r]
                    full = sorted(
                        range(m), key=lambda j: (-s[j], b_cids[j])
                    )[:take]
                    top_idx[r] = full
            out_cells = cids_arr[top_idx]
            yield pd.DataFrame(
                {
                    v_id: np.repeat(np.asarray(vids), take),
                    "cell_id": out_cells.ravel(),
                }
            )

    return src.mapInPandas(gen, schema=f"{v_id} {v_type}, cell_id {cell_type}")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """IVF approximate top-k: compare queries only against corpus vectors in
    the query's ``nprobe`` nearest cells. Deterministic given a centroid set
    (a fixed sample, or ``train_centroids`` output stored as a table).

    Scale shape: queries land on their probed cells via broadcast (the
    query side is small by contract); the corpus is scanned once to attach
    its cell and the per-cell scoring is one numpy matmul inside
    ``mapInPandas`` with an in-batch top-k per (query, cell) — the corpus
    vector never crosses the Arrow boundary more than once per probed
    cell, and only candidate top-k rows (<= n_batches x |Q| x k) reach the
    final window. A pair can surface via at most one cell (corpus cells
    are nprobe=1), so no dedup pass is needed.
    """
    import numpy as np
    import pandas as pd

    # query-side: probed cells, collected + broadcast (small by contract)
    query_cells = assign_cells(queries, centroids, q_id, q_vec, nprobe=nprobe)
    qmap: dict = {}
    q_rows = (
        queries.select(F.col(q_id).alias("qid"), F.col(q_vec).alias("qv"))
        .join(F.broadcast(query_cells.withColumnRenamed(q_id, "qid")), "qid")
        .collect()
    )
    for r in q_rows:
        v = np.asarray(r["qv"], dtype=np.float64)
        n = float(np.sqrt(v @ v))
        if n > 0:
            qmap.setdefault(r["cell_id"], []).append((r["qid"], v, n))
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast(qmap)

    q_type = queries.schema[q_id].dataType.simpleString()
    c_type = corpus.schema[c_id].dataType.simpleString()
    corpus_cells = assign_cells(corpus, centroids, c_id, c_vec, nprobe=1)
    src = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv")).join(
        corpus_cells.withColumnRenamed(c_id, "neighbor_id"), "neighbor_id"
    )

    def gen(batches):
        cells = bq.value
        if not cells:
            return
        for pdf in batches:
            out_q: list = []
            out_c: list = []
            out_s: list = []
            for cell_id, grp in pdf.groupby("cell_id"):
                probes = cells.get(cell_id)
                if not probes:
                    continue
                rows = [i for i in range(len(grp)) if grp["__cv"].iloc[i] is not None]
                if not rows:
                    continue
                V = np.vstack(
                    [np.asarray(grp["__cv"].iloc[i], dtype=np.float64) for i in rows]
                )
                vn = np.sqrt(np.einsum("ij,ij->i", V, V))
                ok = vn > 0
                if not ok.any():
                    continue
                V = V[ok]
                vns = vn[ok]
                nids = [grp["neighbor_id"].iloc[rows[i]] for i in np.flatnonzero(ok)]
                Q = np.vstack([p[1] for p in probes])
                qn = np.array([p[2] for p in probes])
                S = (V @ Q.T) / (vns[:, None] * qn[None, :])
                for j, (qid, _, _) in enumerate(probes):
                    s = S[:, j]
                    if include_self:
                        cand = np.arange(len(nids))
                    else:
                        cand = np.flatnonzero(np.array([c != qid for c in nids]))
                    if len(cand) == 0:
                        continue
                    top = sorted(cand, key=lambda i: (-s[i], nids[i]))[:k]
                    for i in top:
                        out_q.append(qid)
                        out_c.append(nids[i])
                        out_s.append(s[i])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    scored = src.mapInPandas(
        gen, schema=f"query_id {q_type}, neighbor_id {c_type}, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 5,
    v_id: str = "vec_id",
    v_vec: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means (cosine assignment, mean update) to train IVF coarse
    centroids. Deterministic: init = the k vectors with smallest ids.

    Scale shape: each iteration is ONE ``mapInPandas`` scan emitting k
    partial (sum, count) rows per Arrow batch — the map-side-combine
    pattern — so the driver only ever reduces ``k x n_batches`` small rows,
    never touches vectors. No shuffle at any point; the corpus is read
    ``iters`` times (cache it upstream if iterating many times).
    Returns (cell_id: int, embedding: array<double>), ready for
    ``ivf_topk`` / ``cosine_pairs_lsh``.
    """
    import numpy as np
    import pandas as pd

    init = vectors.orderBy(v_id).limit(k).select(v_vec).collect()
    C = np.vstack([np.asarray(r[0], dtype=np.float64) for r in init])
    sc = vectors.sparkSession.sparkContext
    src = vectors.select(F.col(v_vec).alias("__v"))

    for _ in range(iters):
        bC = sc.broadcast(C)

        def gen(batches):
            Cl = bC.value
            kk = Cl.shape[0]
            cn = np.sqrt(np.einsum("ij,ij->i", Cl, Cl))
            cn[cn == 0] = 1.0
            Cn = Cl / cn[:, None]
            sums = np.zeros_like(Cl)
            counts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                vals = [v for v in pdf["__v"] if v is not None]
                if not vals:
                    continue
                V = np.vstack([np.asarray(v, dtype=np.float64) for v in vals])
                vn = np.sqrt(np.einsum("ij,ij->i", V, V))
                ok = vn > 0
                if not ok.any():
                    continue
                V = V[ok]
                a = np.argmax((V / vn[ok][:, None]) @ Cn.T, axis=1)
                np.add.at(sums, a, V)
                counts += np.bincount(a, minlength=kk)
            yield pd.DataFrame(
                {
                    "cell": pd.array(range(kk), dtype="int32"),
                    "cnt": pd.array(counts, dtype="int64"),
                    "vsum": [row.tolist() for row in sums],
                }
            )

        parts = src.mapInPandas(
            gen, schema="cell int, cnt long, vsum array<double>"
        ).toPandas()
        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        for _, r in parts.iterrows():
            sums[r["cell"]] += np.asarray(r["vsum"])
            counts[r["cell"]] += r["cnt"]
        nonempty = counts > 0
        C = np.where(nonempty[:, None], sums / np.maximum(counts, 1)[:, None], C)

    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(C.shape[0])],
        "cell_id int, embedding array<double>",
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id1 < id2) pairs with cosine >= threshold. Exact. The pair join
    broadcasts one side when small; at scale, pre-bucket by an LSH sketch
    or IVF cell and run per-bucket (see ivf_topk) before exact verify."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2"))
    return (
        a.join(F.broadcast(b), F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine_arrow("__v1", "__v2").alias("score"))
        .where(F.col("score") >= threshold)
    )


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    nprobe: int = 2,
    max_rows_per_cell: int = 8192,
) -> DataFrame:
    """Approximate pair search: only pairs sharing an IVF cell (``nprobe``
    nearest cells per vector) are scored. Recall < 1 by construction; the
    100 TB path where exact all-pairs is infeasible.

    Scale shape: ONE shuffle (groupBy cell) of n x nprobe rows, then a
    single numpy gram matmul per cell inside ``applyInPandas`` — in-cell
    pair scores never leave the worker unless they clear the threshold.
    The alternative (bucket self-join -> distinct -> re-score) shuffles
    the full candidate pair set with vectors attached (measured 33s at
    sf0.1 vs ~3s for this). Emitted pairs are re-scored with a per-pair
    dot in a fixed fp op order so the same pair found in two shared cells
    dedupes to the identical score.

    Hot cells are salted LOSSLESSLY: any cell with more than
    ``max_rows_per_cell`` rows is hash-split into B = ceil(n/cap) blocks
    (deterministic xxhash64 of the id — no rand()), and every unordered
    block pair (b1 <= b2) becomes its own task holding only those two
    blocks' rows: the diagonal task (b,b) scores its in-block pairs, an
    off-diagonal task (b1,b2) scores only cross-block pairs via a
    rectangular matmul. Each in-cell pair lands in EXACTLY one task, so
    the output is identical to the unsalted plan (per-pair dot products
    are commutative in IEEE fp), while per-task memory is bounded by
    2 x cap vectors and the cell's unavoidable O(n^2) scoring spreads
    over B(B+1)/2 tasks instead of flattening one worker. The B-way row
    fan-out only applies to oversized cells; cells under the cap take the
    single-task path with B=1.

    Output columns: (id1, id2, score).
    """
    if centroids is None:
        raise ValueError("centroids DataFrame required")
    if max_rows_per_cell < 2:
        raise ValueError("max_rows_per_cell must be >= 2")
    import numpy as np
    import pandas as pd

    from pyspark import StorageLevel

    # assign_cells is a mapInPandas subtree with TWO downstream consumers
    # (the counts aggregation and the join back for salting) — persist it
    # per the repo invariant so the Python assignment scan runs once.
    # cells is the small (id, cell_id) relation (no vectors), so the
    # cached footprint is rows x ~16 bytes; blocks are released by the
    # ContextCleaner when the plan is dropped.
    cells = assign_cells(df, centroids, id_col, vec_col, nprobe=nprobe).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")).join(
        cells.withColumnRenamed(id_col, "id"), "id"
    )
    # cell-sized relation (one row per cell) -> broadcast back for salting
    counts = v.groupBy("cell_id").agg(F.count(F.lit(1)).alias("__cn"))
    v = (
        v.join(F.broadcast(counts), "cell_id")
        .withColumn(
            "__nb",
            F.ceil(F.col("__cn") / F.lit(max_rows_per_cell)).cast("int"),
        )
        .withColumn(
            "__blk", F.pmod(F.xxhash64(F.col("id")), F.col("__nb")).cast("int")
        )
        # replicate each row into every task that needs its block: task key
        # (least, greatest) pairs block b with every other block exactly once
        .withColumn(
            "__ob", F.explode(F.sequence(F.lit(0), F.col("__nb") - 1))
        )
        .select(
            "cell_id",
            "id",
            "__v",
            "__blk",
            F.least("__blk", "__ob").alias("__b1"),
            F.greatest("__blk", "__ob").alias("__b2"),
        )
    )
    id_type = df.schema[id_col].dataType.simpleString()

    def _emit(ids1, ids2, V1, V2, n1, n2, ii, jj):
        o1: list = []
        o2: list = []
        os_: list = []
        for i, j in zip(ii, jj):
            s = float(np.dot(V1[i], V2[j]) / (n1[i] * n2[j]))
            if s >= threshold:
                a, b = ids1[i], ids2[j]
                if b < a:
                    a, b = b, a
                o1.append(a)
                o2.append(b)
                os_.append(s)
        return pd.DataFrame({"id1": o1, "id2": o2, "score": os_})

    def score_cell(key, pdf):  # (key, batch) form; no hints so eval type
        # is inferred from arity (partial hints raise a UserWarning)
        empty = pd.DataFrame({"id1": [], "id2": [], "score": []})
        if len(pdf) < 2:
            return empty
        _, b1, b2 = key
        V = np.vstack([np.asarray(x, dtype=np.float64) for x in pdf["__v"]])
        nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
        ok = nrm > 0
        if ok.sum() < 2:
            return empty
        V = V[ok]
        nrm = nrm[ok]
        idx = np.flatnonzero(ok)
        ids = [pdf["id"].iloc[i] for i in idx]
        if b1 == b2:
            # diagonal task: all in-block pairs (the B=1 fast path too)
            S = (V @ V.T) / np.outer(nrm, nrm)
            # small margin: the gram matmul only FINDS candidates;
            # membership is decided by the per-pair recompute in _emit
            ii, jj = np.nonzero(np.triu(S >= threshold - 1e-9, k=1))
            return _emit(ids, ids, V, V, nrm, nrm, ii, jj)
        # off-diagonal task: ONLY cross-block pairs (in-block pairs belong
        # to the two diagonal tasks)
        blk = pdf["__blk"].to_numpy()[idx]
        m1 = blk == b1
        m2 = blk == b2
        if not (m1.any() and m2.any()):
            return empty
        i1 = np.flatnonzero(m1)
        i2 = np.flatnonzero(m2)
        S = (V[i1] @ V[i2].T) / np.outer(nrm[i1], nrm[i2])
        ii, jj = np.nonzero(S >= threshold - 1e-9)
        return _emit(
            [ids[i] for i in i1],
            [ids[j] for j in i2],
            V[i1],
            V[i2],
            nrm[i1],
            nrm[i2],
            ii,
            jj,
        )

    pairs = v.groupBy("cell_id", "__b1", "__b2").applyInPandas(
        score_cell, schema=f"id1 {id_type}, id2 {id_type}, score double"
    )
    # a pair can surface in up to nprobe shared cells; scores are identical
    # by construction so any representative survives
    return pairs.dropDuplicates(["id1", "id2"])


def pca_project(
    vectors: DataFrame,
    k: int = 2,
    v_id: str = "vec_id",
    v_vec: str = "embedding",
) -> tuple[DataFrame, "object"]:
    """PCA dimensionality reduction for embedding columns ->
    (projected DataFrame (id, proj: array<double>), explained-variance
    ratios numpy array).

    The distributed shape that makes PCA viable at 100 TB: the data-sized
    work is ONE Arrow pass emitting per-batch covariance partials
    (count, sum vector, flattened sum of outer products — d*(d+3)/2-ish
    doubles per batch, NOT per row); the driver reduces n_batches
    partial rows and runs the d x d eigendecomposition locally (d is the
    embedding dim, <= a few thousand — the n x d corpus never leaves the
    executors); the top-k components broadcast back into a second
    map-only Arrow pass for projection. Two passes, zero shuffles.
    Deterministic: partial sums are reduced with numpy float64 in a fixed
    driver-side order and eigenvector sign is pinned (largest-|component|
    coordinate made positive).
    """
    import numpy as np
    import pandas as pd

    src = vectors.select(F.col(v_id).alias("id"), F.col(v_vec).alias("v"))

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "ss": [(m.T @ m).ravel().tolist()],
                }
            )

    parts = src.mapInPandas(
        partials, schema="n long, s array<double>, ss array<double>"
    ).toPandas()
    if not len(parts):
        raise ValueError("pca_project: empty input")
    n = int(parts["n"].sum())
    d = len(parts["s"].iloc[0])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for _, row in parts.iterrows():
        s += np.asarray(row["s"])
        ss += np.asarray(row["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]  # d x k
    # pin sign: make the largest-magnitude coordinate of each component positive
    for j in range(comps.shape[1]):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    total_var = float(np.clip(evals.sum(), 1e-300, None))
    ratios = np.sort(evals)[::-1][:k] / total_var

    spark = vectors.sparkSession
    b_mean = spark.sparkContext.broadcast(mean)
    b_comps = spark.sparkContext.broadcast(comps)

    def project(batches):
        mu, w = b_mean.value, b_comps.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            p = (m - mu) @ w
            yield pd.DataFrame({"id": pdf["id"], "proj": [r.tolist() for r in p]})

    id_type = vectors.schema[v_id].dataType.simpleString()
    out = src.mapInPandas(project, schema=f"id {id_type}, proj array<double>")
    return out.withColumnRenamed("id", v_id), ratios


def pq_sampled_codebooks(
    vectors: DataFrame,
    n_codes: int = 16,
    m: int = 8,
    v_id: str = "vec_id",
    v_vec: str = "embedding",
):
    """Deterministic PQ codebooks WITHOUT training: the sub-vectors of the
    first ``n_codes`` vectors (by id) become the codewords of each of the
    ``m`` subspaces. Returns numpy (m, n_codes, d/m) float64.

    This is the SQL-replayable variant (a DuckDB oracle can reconstruct
    it exactly — see `ann_topk_pq`); :func:`train_pq_codebooks` is the
    quality path (per-subspace Lloyd) for production indexes."""
    import numpy as np

    rows = vectors.orderBy(v_id).limit(n_codes).select(v_vec).collect()
    if len(rows) < n_codes:
        raise ValueError(f"pq_sampled_codebooks: need {n_codes} vectors")
    C = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    d = C.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    # (n_codes, m, dsub) -> (m, n_codes, dsub)
    return C.reshape(n_codes, m, dsub).transpose(1, 0, 2).copy()


def train_pq_codebooks(
    vectors: DataFrame,
    n_codes: int = 16,
    m: int = 8,
    iters: int = 3,
    v_id: str = "vec_id",
    v_vec: str = "embedding",
):
    """Product-quantization codebooks via per-subspace Lloyd iterations —
    the quality path (lower reconstruction distortion than sampling).

    Same 100 TB shape as ``train_centroids``: initialization is the
    deterministic sample (:func:`pq_sampled_codebooks`); each iteration
    is ONE ``mapInPandas`` pass emitting per-batch (subspace, code,
    count, sum-vector) partials for ALL m subspaces at once — the driver
    reduces m x n_codes x batches partial rows (never vectors), so the
    corpus is scanned ``iters`` times and nothing shuffles. Empty cells
    keep their previous codeword. Returns numpy (m, n_codes, d/m)."""
    import numpy as np
    import pandas as pd

    C = pq_sampled_codebooks(vectors, n_codes, m, v_id, v_vec)
    dsub = C.shape[2]
    sc = vectors.sparkSession.sparkContext
    src = vectors.select(F.col(v_vec).alias("__v"))

    for _ in range(iters):
        bC = sc.broadcast(C)

        def gen(batches):
            Cl = bC.value  # (m, k, dsub)
            mm, kk, ds = Cl.shape
            sums = np.zeros((mm, kk, ds))
            counts = np.zeros((mm, kk), dtype=np.int64)
            for pdf in batches:
                vals = [v for v in pdf["__v"] if v is not None]
                if not vals:
                    continue
                V = np.vstack(
                    [np.asarray(v, dtype=np.float64) for v in vals]
                ).reshape(len(vals), mm, ds)
                for j in range(mm):
                    # (b, k) squared L2 distances in subspace j
                    D = (
                        np.einsum("bd,bd->b", V[:, j], V[:, j])[:, None]
                        - 2.0 * V[:, j] @ Cl[j].T
                        + np.einsum("kd,kd->k", Cl[j], Cl[j])[None, :]
                    )
                    a = np.argmin(D, axis=1)
                    np.add.at(sums[j], a, V[:, j])
                    counts[j] += np.bincount(a, minlength=kk)
            recs = []
            for j in range(mm):
                for c in range(kk):
                    recs.append((j, c, int(counts[j, c]), sums[j, c].tolist()))
            yield pd.DataFrame(
                recs, columns=["j", "c", "cnt", "vsum"]
            )

        parts = src.mapInPandas(
            gen, schema="j int, c int, cnt long, vsum array<double>"
        ).toPandas()
        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[:2], dtype=np.int64)
        for _, r in parts.iterrows():
            sums[r["j"], r["c"]] += np.asarray(r["vsum"])
            counts[r["j"], r["c"]] += r["cnt"]
        nonempty = counts > 0
        C = np.where(
            nonempty[:, :, None],
            sums / np.maximum(counts, 1)[:, :, None],
            C,
        )
    return C


def pq_encode(
    vectors: DataFrame,
    codebooks,
    v_id: str = "vec_id",
    v_vec: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices -> (id, codes:
    array<int>). One broadcast (the codebooks are m x k x d/m floats —
    KBs) + one Arrow pass; at 100 TB the 100x-smaller code table is what
    ships to the ADC scorer, not the float vectors. Ties break to the
    lowest code (matches the SQL oracle's ORDER BY d2, code)."""
    import numpy as np
    import pandas as pd

    sc = vectors.sparkSession.sparkContext
    bC = sc.broadcast(np.asarray(codebooks, dtype=np.float64))
    id_type = vectors.schema[v_id].dataType.simpleString()
    src = vectors.select(F.col(v_id).alias("id"), F.col(v_vec).alias("__v"))

    def gen(batches):
        C = bC.value  # (m, k, dsub)
        mm, kk, ds = C.shape
        for pdf in batches:
            vv = pdf["__v"]
            rows = [i for i in range(len(pdf)) if vv.iloc[i] is not None]
            if not rows:
                continue
            # batch-wide (r10): same DIRECT-difference distances and
            # lowest-code argmin tie behavior as the per-row loop this
            # replaces, with the reduction still over the contiguous
            # subspace axis — one einsum per subspace per batch instead
            # of one per subspace per ROW
            V3 = np.vstack(
                [np.asarray(vv.iloc[i], dtype=np.float64) for i in rows]
            ).reshape(len(rows), mm, ds)
            codes = np.empty((len(rows), mm), dtype=np.int32)
            for j in range(mm):
                diff = C[j][None, :, :] - V3[:, j][:, None, :]
                D = np.einsum("bkd,bkd->bk", diff, diff)
                codes[:, j] = np.argmin(D, axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy()[rows], "codes": list(codes)}
            )

    return src.mapInPandas(gen, schema=f"id {id_type}, codes array<int>")


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation over PQ codes:
    score(q, x) ~= dot(q, x_hat) / (|q| |x_hat|) where x_hat is x's
    codeword reconstruction — the corpus contributes only its m-byte-ish
    code rows, never float vectors.

    Scale shape mirrors ``brute_force_topk``: the per-query lookup tables
    T[q, j, c] = dot(q_sub_j, codeword_{j,c}) (|Q| x m x k doubles) are
    built driver-side and broadcast; ONE Arrow pass over the codes does
    m gathers + adds per batch and keeps per-batch top-k per query
    (ordered by ROUNDED score desc, neighbor_id asc — the same total
    order as the final window, so the global top-k is exact w.r.t. the
    ADC scores); the final window ranks n_batches x |Q| x k candidate
    rows. Ranking on the 4dp-rounded score makes the result robust to
    sub-ulp summation differences against the SQL oracle.

    Output: (query_id, neighbor_id, score, rank)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    mm, kk, ds = C.shape
    q_rows = queries.select(q_id, q_vec).collect()  # small by contract
    qids = [r[0] for r in q_rows]
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    keep = qn > 0
    qids = [i for i, ok in zip(qids, keep) if ok]
    Q, qn = Q[keep], qn[keep]
    nq = len(qids)
    Qs = Q.reshape(nq, mm, ds)
    # T[q, j, c] = dot(q_sub_j, codeword_{j,c}); cbn2[j, c] = |codeword|^2
    T = np.einsum("qjd,jkd->qjk", Qs, C)
    cbn2 = np.einsum("jkd,jkd->jk", C, C)
    sc = codes.sparkSession.sparkContext
    b = sc.broadcast((qids, T, cbn2, qn))
    q_type = queries.schema[q_id].dataType.simpleString()
    c_type = codes.schema["id"].dataType.simpleString()
    src = codes.select(F.col("id").alias("neighbor_id"), "codes")

    def gen(batches):
        b_qids, b_T, b_n2, b_qn = b.value
        m_ = b_n2.shape[0]
        nq_ = len(b_qids)
        if nq_ == 0:
            return
        for pdf in batches:
            rows = [i for i in range(len(pdf)) if pdf["codes"].iloc[i] is not None]
            if not rows:
                continue
            Cd = np.vstack(
                [np.asarray(pdf["codes"].iloc[i], dtype=np.int64) for i in rows]
            )  # (b, m)
            cids = [pdf["neighbor_id"].iloc[i] for i in rows]
            ip = np.zeros((nq_, Cd.shape[0]))
            n2 = np.zeros(Cd.shape[0])
            for j in range(m_):  # fixed j order = the oracle's ordered sum
                ip += b_T[:, j, Cd[:, j]]
                n2 += b_n2[j, Cd[:, j]]
            xn = np.sqrt(n2)
            ok = xn > 0
            out_q, out_c, out_s = [], [], []
            for qi in range(nq_):
                s = np.where(ok, ip[qi] / (b_qn[qi] * np.where(ok, xn, 1.0)), -np.inf)
                sr = np.round(s, 4) + 0.0
                mask = [
                    i
                    for i in range(len(cids))
                    if ok[i] and cids[i] != b_qids[qi]
                ]
                order = sorted(mask, key=lambda i: (-sr[i], cids[i]))[:k]
                for i in order:
                    out_q.append(b_qids[qi])
                    out_c.append(cids[i])
                    out_s.append(float(sr[i]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    scored = src.mapInPandas(
        gen, schema=f"query_id {q_type}, neighbor_id {c_type}, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ivf_pq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """(id, cell_id, codes): the persistent IVF-PQ index relation in ONE
    Arrow pass over the corpus. r10 — the previous composition ran
    :func:`assign_cells` and :func:`pq_encode` as two separate corpus
    scans and shuffle-JOINED their outputs back together by id; cell and
    codes are both per-row functions of the embedding, so the join (two
    corpus-sized exchanges) and the second scan were pure overhead.

    Float contracts are preserved exactly: cell sim is the same
    ``(V @ C.T) / (vn * cn)`` matmul as ``assign_cells`` (tiebreak
    cell_id asc via a min-over-tied-cells reduction — only maximal sims
    participate); PQ distances keep ``pq_encode``'s DIRECT difference
    formulation ``sum((c - v)^2)`` (the oracle's list_sum shape), batch-
    vectorized with the reduction still over the contiguous subspace
    axis, and ``argmin`` keeps lowest-code tie behavior. Rows dropped
    match the old inner join: NULL vectors (both passes) and zero-norm
    vectors (assign_cells)."""
    import numpy as np
    import pandas as pd

    c_rows = centroids.select("cell_id", "embedding").collect()  # small side
    cc_ids = [r[0] for r in c_rows]
    CC = np.vstack([np.asarray(r[1], dtype=np.float64) for r in c_rows])
    ccn = np.sqrt(np.einsum("ij,ij->i", CC, CC))
    keep = ccn > 0
    cc_ids = [i for i, ok2 in zip(cc_ids, keep) if ok2]
    Cq = np.asarray(codebooks, dtype=np.float64)
    sc = corpus.sparkSession.sparkContext
    b = sc.broadcast((cc_ids, CC[keep], ccn[keep], Cq))
    id_type = corpus.schema[c_id].dataType.simpleString()
    cell_type = centroids.schema["cell_id"].dataType.simpleString()
    src = corpus.select(F.col(c_id).alias("id"), F.col(c_vec).alias("__v"))

    def gen(batches):
        b_cids, b_C, b_cn, b_Cq = b.value
        mm, kk, ds = b_Cq.shape
        cids_arr = np.asarray(b_cids)
        big = cids_arr.max() + 1 if len(cids_arr) else 0
        for pdf in batches:
            vv = pdf["__v"]
            rows = [i for i in range(len(pdf)) if vv.iloc[i] is not None]
            if not rows:
                continue
            V = np.vstack([np.asarray(vv.iloc[i], dtype=np.float64) for i in rows])
            vn = np.sqrt(np.einsum("ij,ij->i", V, V))
            ok = vn > 0
            if not ok.any():
                continue
            V = V[ok]
            ids = pdf["id"].to_numpy()[rows][ok]
            S = (V @ b_C.T) / (vn[ok][:, None] * b_cn[None, :])
            mx = S.max(axis=1, keepdims=True)
            cell = np.where(S >= mx, cids_arr[None, :], big).min(axis=1)
            V3 = V.reshape(len(V), mm, ds)
            codes = np.empty((len(V), mm), dtype=np.int32)
            for j in range(mm):
                diff = b_Cq[j][None, :, :] - V3[:, j][:, None, :]
                D = np.einsum("bkd,bkd->bk", diff, diff)
                codes[:, j] = np.argmin(D, axis=1)  # lowest code on ties
            yield pd.DataFrame(
                {"id": ids, "cell_id": cell, "codes": list(codes)}
            )

    return src.mapInPandas(
        gen, schema=f"id {id_type}, cell_id {cell_type}, codes array<int>"
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks,
    k: int = 5,
    nprobe: int = 2,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """The full IVF-PQ composition — the canonical production ANN shape
    at 100 TB: IVF cells bound the SCAN (each query touches
    ~nprobe/n_cells of the corpus) and PQ codes bound the MEMORY (the
    scorer reads ~m small ints per vector, never the floats).

    Plan: corpus vectors are cell-assigned AND PQ-encoded in ONE fused
    Arrow pass (:func:`ivf_pq_index` — r10: the previous two-scan-plus-
    id-join composition paid a second corpus read and two corpus-sized
    exchanges for what is a per-row computation); the (id, cell, codes)
    relation is the persistent index a real deployment would store.
    Queries' probed cells and ADC lookup tables are broadcast; ONE Arrow
    pass over the index rows scores each code row only for the queries
    probing its cell and keeps per-batch top-k (rounded-score order, the
    same total order as the final window). A (query, vector) pair can
    surface via exactly one cell, so no dedup pass is needed. Output:
    (query_id, neighbor_id, score, rank)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(codebooks, dtype=np.float64)
    mm, kk, ds = C.shape
    index = ivf_pq_index(corpus, centroids, C, c_id, c_vec)

    probed: dict = {}
    for r in assign_cells(queries, centroids, q_id, q_vec, nprobe=nprobe).collect():
        probed.setdefault(r[0], set()).add(r["cell_id"])
    q_rows = queries.select(q_id, q_vec).collect()
    qids, qvecs = [], []
    for r in q_rows:
        v = np.asarray(r[1], dtype=np.float64)
        n = float(np.sqrt(v @ v))
        if n > 0 and r[0] in probed:
            qids.append(r[0])
            qvecs.append(v)
    if not qids:
        raise ValueError("ivf_pq_topk: no usable query vectors")
    Q = np.vstack(qvecs)
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    T = np.einsum("qjd,jkd->qjk", Q.reshape(len(qids), mm, ds), C)
    cbn2 = np.einsum("jkd,jkd->jk", C, C)
    sc = corpus.sparkSession.sparkContext
    b = sc.broadcast((qids, [probed[q] for q in qids], T, cbn2, qn))
    q_type = queries.schema[q_id].dataType.simpleString()
    c_type = corpus.schema[c_id].dataType.simpleString()

    def gen(batches):
        b_qids, b_cells, b_T, b_n2, b_qn = b.value
        m_ = b_n2.shape[0]
        for pdf in batches:
            rows = [i for i in range(len(pdf)) if pdf["codes"].iloc[i] is not None]
            if not rows:
                continue
            Cd = np.vstack(
                [np.asarray(pdf["codes"].iloc[i], dtype=np.int64) for i in rows]
            )
            cids = [pdf["id"].iloc[i] for i in rows]
            ccell = [pdf["cell_id"].iloc[i] for i in rows]
            ip = np.zeros((len(b_qids), Cd.shape[0]))
            n2 = np.zeros(Cd.shape[0])
            for j in range(m_):  # fixed j order = the oracle's ordered sum
                ip += b_T[:, j, Cd[:, j]]
                n2 += b_n2[j, Cd[:, j]]
            xn = np.sqrt(n2)
            ok = xn > 0
            out_q, out_c, out_s = [], [], []
            for qi, (qid, qcells) in enumerate(zip(b_qids, b_cells)):
                s = ip[qi] / (b_qn[qi] * np.where(ok, xn, 1.0))
                sr = np.round(s, 4) + 0.0
                mask = [
                    i
                    for i in range(len(cids))
                    if ok[i] and ccell[i] in qcells and cids[i] != qid
                ]
                order = sorted(mask, key=lambda i: (-sr[i], cids[i]))[:k]
                for i in order:
                    out_q.append(qid)
                    out_c.append(cids[i])
                    out_s.append(float(sr[i]))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_c, "score": out_s}
            )

    scored = index.mapInPandas(
        gen, schema=f"query_id {q_type}, neighbor_id {c_type}, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
