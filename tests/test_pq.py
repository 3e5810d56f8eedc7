"""Product quantization (operators/pq) — compressed-domain ANN.

Pins: encode parity vs a pure-numpy reference, the ADC = <q, reconstruct>
identity, fitted codebooks beating random ones on reconstruction error,
IVFPQ recall vs brute force with FITTED codebooks, and the loud-failure
geometry guards (the silent -1-code / one-bucket degeneracies).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from drift_detection_pibic___framework_spark.operators import pq as PQ
from drift_detection_pibic___framework_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, X


def np_encode(X: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Pure-numpy PQ encode: first-occurrence argmin per subspace."""
    m, k, dsub = B.shape
    codes = np.empty((len(X), m), dtype=np.int64)
    for j in range(m):
        Ssub = X[:, j * dsub:(j + 1) * dsub]
        d2 = ((Ssub[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def test_encode_matches_numpy_reference(emb, emb_np):
    """Spark's transform/argmin encode == numpy argmin, per vector and
    subspace, with FITTED codebooks (the literal path is separately
    certified cross-engine by the emb_pq_codes oracle)."""
    ids, X = emb_np
    B = PQ.pq_fit_codebooks(emb, m=8, k=16, sample_rows=200, n_iter=5)
    want = dict(zip(ids, np_encode(X, B)))
    got = PQ.with_pq_code(emb, B).select("vec_id", "pq_code").collect()
    assert len(got) == len(ids)
    for r in got:
        assert list(r.pq_code) == list(want[r.vec_id]), r.vec_id


def test_adc_equals_dot_of_reconstruction(spark, emb):
    """The ADC identity: sum_j lut[j][code_j] == <q, reconstruct(code)>
    exactly (linearity of the dot product over concatenated subspaces —
    both sides are the same m partial dots added in the same order)."""
    B = PQ.random_codebooks(64, 8, 16, seed=7)
    q = emb.limit(1).select(F.col("embedding").alias("qv"))
    coded = PQ.with_pq_code(emb.limit(20), B)
    joined = coded.crossJoin(F.broadcast(q))
    lut = PQ.adc_lut(F.col("qv"), B)
    via_lut = PQ.adc_score(lut, F.col("pq_code"))
    recon = PQ.pq_reconstruct(F.col("pq_code"), B)
    via_recon = F.aggregate(
        F.zip_with(F.col("qv"), recon,
                   lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, v: acc + v)
    rows = joined.select(via_lut.alias("a"), via_recon.alias("b")).collect()
    assert rows and all(abs(r.a - r.b) < 1e-9 for r in rows)


def test_adc_unrolled_bit_identical(spark, emb):
    """adc_score(m=...) — the unrolled element_at chain the hot path
    uses — must be BIT-identical to the aggregate/zip_with fallback:
    both are the same strict left fold ((0+v1)+v2)+..., so equality is
    ==, not a tolerance."""
    B = PQ.random_codebooks(64, 8, 16, seed=11)
    q = emb.limit(1).select(F.col("embedding").alias("qv"))
    coded = PQ.with_pq_code(emb.limit(50), B)
    lut = PQ.adc_lut(F.col("qv"), B)
    rows = (coded.crossJoin(F.broadcast(q))
            .select(PQ.adc_score(lut, F.col("pq_code")).alias("agg"),
                    PQ.adc_score(lut, F.col("pq_code"), m=8)
                    .alias("unrolled")).collect())
    assert rows and all(r.agg == r.unrolled for r in rows)


def test_fitted_beats_random_reconstruction(emb, emb_np):
    """k-means codebooks must reconstruct the corpus strictly better than
    seeded random ones — the sanity pin that pq_fit_codebooks actually
    fits (per-subspace Lloyd iterations reduce quantization MSE).  The
    margin is modest by construction: the fixture embeddings are
    near-uniform on the sphere (measured fitted/random ~ 0.78), so the
    pin is 'fitting helps', not a clustering benchmark."""
    _, X = emb_np
    fitted = PQ.pq_fit_codebooks(emb, m=8, k=16, sample_rows=200,
                                 n_iter=8)
    rand = PQ.random_codebooks(64, 8, 16, seed=7)

    def mse(B):
        m, k, dsub = B.shape
        codes = np_encode(X, B)
        recon = np.concatenate(
            [B[j][codes[:, j]] for j in range(m)], axis=1)
        return float(((X - recon) ** 2).mean())

    assert mse(fitted) < 0.9 * mse(rand)


def test_ivfpq_refine_recall_vs_brute_force(spark, emb):
    """Two-stage search (ADC shortlist -> exact re-rank) with FITTED
    centroids + codebooks: recall@5 >= 0.55 on the fixture embeddings.
    Context for the number: the fixtures are near-uniform on the sphere
    — PQ's worst case, since exact-top-5 cosine gaps sit inside the
    quantization noise — so pure-ADC ranking recalls only ~0.2-0.3
    (pinned separately below) while the refine stage recovers the
    shortlist's coverage (~0.67 measured; IVF's own n_probe=8 ceiling
    is 0.80).  Everything is seeded, so the measured value is
    deterministic; the margin guards codebook-fit changes only."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, queries, k=5)
    approx = PQ.ivfpq_refine_topk(emb, queries, k=5, shortlist=50,
                                  n_probe=8)
    want = {(r.query_id, r.nbr_id) for r in exact.collect()}
    got = {(r.query_id, r.nbr_id) for r in approx.collect()}
    assert want, "brute force returned nothing"
    recall = len(want & got) / len(want)
    assert recall >= 0.55, f"refined recall@5 = {recall:.2f}"


def test_ivfpq_adc_better_than_chance(spark, emb):
    """Pure-ADC ranking (no refine) must still carry signal on the
    worst-case near-uniform fixtures: recall@5 >= 0.15 vs ~0.01 for
    random guessing (5/499 per query)."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, queries, k=5)
    approx = PQ.ivfpq_topk(emb, queries, k=5, n_probe=8,
                           n_centroids=16, pq_m=8, pq_k=16)
    want = {(r.query_id, r.nbr_id) for r in exact.collect()}
    got = {(r.query_id, r.nbr_id) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.15, f"ADC recall@5 = {recall:.2f}"


def test_codes_are_compact_ints(emb):
    """The compression contract: m ints in [0, k), never -1 (the silent
    null-poisoned-argmin sentinel the dim guard exists to prevent)."""
    B = PQ.random_codebooks(64, 8, 16, seed=7)
    rows = PQ.with_pq_code(emb, B).select("pq_code").collect()
    for r in rows:
        assert len(r.pq_code) == 8
        assert all(0 <= c < 16 for c in r.pq_code)


def test_dim_mismatch_raises(spark):
    """A 32-dim column against 64-dim codebooks must raise, not encode
    tail subspaces as -1 (short slice -> null-padded zip_with ->
    array_min NULL -> array_position 0)."""
    B = PQ.random_codebooks(64, 8, 16, seed=7)
    df = spark.createDataFrame(
        [(1, [0.0] * 32)], "vec_id int, embedding array<float>")
    with pytest.raises(ValueError, match="64"):
        PQ.with_pq_code(df, B)


def test_m_must_divide_dim():
    with pytest.raises(ValueError, match="divide"):
        PQ.random_codebooks(64, m=7)


def test_codebook_shape_validated():
    with pytest.raises(ValueError, match="m, k, dsub"):
        PQ.pq_dists("embedding", np.zeros((8, 16)))


# -------------------------------------------------------------------------
# persisted index (AnnIndex pq mode)
# -------------------------------------------------------------------------

def _plan_text(df) -> str:
    import io as _io
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def pq_index(spark, emb, tmp_path):
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    C = S.random_unit_centroids(64, 16, seed=42)
    B = PQ.random_codebooks(64, 8, 16, seed=7)
    idx = S.AnnIndex(ParquetTableIO(str(tmp_path / "annpq")))
    idx.build(emb.filter(F.col("vec_id") % 2 == 0), centroids=C,
              codebooks=B)
    idx.admit(emb.filter(F.col("vec_id") % 2 == 1))
    yield idx, C, B
    idx.release()


def test_index_adc_matches_one_shot_ivfpq(spark, emb, pq_index):
    """build(half, pq) + admit(half) + search(mode='adc') must be
    bit-identical to ivfpq_topk over the full table with the same
    literal centroids + codebooks — the persist/append/probe round-trip
    carries codes exactly."""
    idx, C, B = pq_index
    queries = emb.filter(F.col("vec_id") < 10)
    got = idx.search(spark, queries, k=5, n_probe=4, mode="adc")
    want = PQ.ivfpq_topk(emb, queries, k=5, n_probe=4,
                         centroids=C, codebooks=B)
    g = sorted(((r.query_id, r.nbr_id, r.adc_score, r.rank)
                for r in got.collect()))
    w = sorted(((r.query_id, r.nbr_id, r.adc_score, r.rank)
                for r in want.collect()))
    assert g == w and g


def test_index_adc_scan_never_reads_embeddings(spark, emb, pq_index):
    """The compressed-domain scale pin: stage-1 ADC reads ONLY
    (vec_id, ivf_cell, pq_code) from the inverted file — the embedding
    column (the dominant bytes, dim*4 B/row) must be absent from every
    parquet ReadSchema in the plan, on top of the probed-cell file cut."""
    idx, _, _ = pq_index
    # few queries, narrow probe: most of the 16 cells stay unprobed, so
    # the kept-file subset is strict and the pruning assert is meaningful
    queries = emb.filter(F.col("vec_id") < 3)
    plan = _plan_text(idx.search(spark, queries, k=5, n_probe=2,
                                 mode="adc"))
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln
             and "pq_code" in ln]
    assert scans, plan  # the codes scan is present...
    assert all("embedding" not in ln for ln in scans), plan
    # ...and file pruning engaged on it (probe report already populated)
    rep = idx.last_probe_report
    assert rep["files_kept"] < rep["files_total"], rep


def test_index_refine_matches_operator_refine(spark, emb, pq_index):
    """search(mode='refine') == ivfpq_refine_topk over the full table
    (same shortlist by ADC parity, same exact re-rank contract)."""
    idx, C, B = pq_index
    queries = emb.filter(F.col("vec_id") < 10)
    got = idx.search(spark, queries, k=5, n_probe=8, mode="refine",
                     shortlist=25)
    want = PQ.ivfpq_refine_topk(emb, queries, k=5, shortlist=25,
                                n_probe=8, centroids=C, codebooks=B)
    g = sorted(((r.query_id, r.nbr_id, r.cosine, r.rank)
                for r in got.collect()))
    w = sorted(((r.query_id, r.nbr_id, r.cosine, r.rank)
                for r in want.collect()))
    assert g == w and g


def test_driver_probe_budget_is_payload_aware(spark, emb, pq_index):
    """The driver-probe cap must account for PAYLOAD width, not just row
    count: an ADC search materializes an m*k-double LUT per (query,
    probed cell) row in the broadcast LocalRelation, ~n_probe*m*k*8
    bytes per query — at the default 65536-row cap with a (8, 256)
    codebook that would be a multi-GiB local frame.  With a budget sized
    between exact's and ADC's per-query payload (exact: n_probe*dim*8 =
    2048 B here; adc: n_probe*m*k*8 = 4096 B), the SAME 10-query batch
    takes the driver path in exact mode but falls back to cluster-side
    scoring in adc mode — with bit-identical results."""
    idx, C, B = pq_index
    idx.driver_probe_budget = 2048 * 10        # exact fits, adc doesn't
    queries = emb.filter(F.col("vec_id") < 10)

    idx.search(spark, queries, k=5, n_probe=4, mode="exact").count()
    assert idx._pinned is None                 # driver path engaged

    via_budget_fallback = sorted(
        (r.query_id, r.nbr_id, r.adc_score, r.rank)
        for r in idx.search(spark, queries, k=5, n_probe=4,
                            mode="adc").collect())
    assert idx._pinned is not None             # cluster path engaged
    idx.release()

    idx.driver_probe_budget = 128 << 20
    via_driver = sorted(
        (r.query_id, r.nbr_id, r.adc_score, r.rank)
        for r in idx.search(spark, queries, k=5, n_probe=4,
                            mode="adc").collect())
    assert idx._pinned is None
    assert via_budget_fallback == via_driver and via_driver


def test_duplicate_query_rows_collapse_in_every_mode(spark, emb, pq_index):
    """A duplicated query ROW must not duplicate scored candidates: left
    in, each copy re-scores every candidate and row_number spends rank
    slots on repeats of the same (query_id, nbr_id).  The driver path
    dedupes rows in _take_queries and the cluster path distincts the
    probed frame — in every mode, on both paths, the duplicated query's
    top-k is k DISTINCT neighbors, identical to the un-duplicated
    batch's."""
    idx, C, B = pq_index
    q1 = emb.filter(F.col("vec_id") < 3)
    dup = q1.union(q1.filter(F.col("vec_id") == 1))

    for mode in ("exact", "adc", "refine"):
        score = "adc_score" if mode == "adc" else "cosine"

        def rows(queries):
            return sorted((r.query_id, r.nbr_id, r[score], r.rank)
                          for r in idx.search(spark, queries, k=5,
                                              n_probe=8, mode=mode,
                                              shortlist=25).collect())
        clean = rows(q1)
        got = rows(dup)                        # driver path
        assert idx._pinned is None
        idx.driver_probe_rows, prev = 0, idx.driver_probe_rows
        want = rows(dup)                       # cluster path
        idx.driver_probe_rows = prev
        idx.release()
        assert got == want == clean, mode
        q1_rows = [r for r in got if r[0] == 1]
        assert len(q1_rows) == 5, mode
        assert len({r[1] for r in q1_rows}) == 5, mode   # distinct nbrs


def test_non_pq_index_refuses_adc(spark, emb, tmp_path):
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    idx = S.AnnIndex(ParquetTableIO(str(tmp_path / "annplain")))
    idx.build(emb, centroids=S.random_unit_centroids(64, 16, seed=42))
    with pytest.raises(ValueError, match="without PQ codebooks"):
        idx.search(spark, emb.limit(2), mode="adc")
    idx.release()


def test_build_validates_codebook_geometry(spark, emb, tmp_path):
    from drift_detection_pibic___framework_spark.sources.tableio import (
        ParquetTableIO)
    idx = S.AnnIndex(ParquetTableIO(str(tmp_path / "annbad")))
    with pytest.raises(ValueError, match="m\\*dsub"):
        idx.build(emb, centroids=S.random_unit_centroids(64, 16, seed=42),
                  codebooks=PQ.random_codebooks(32, 8, 16, seed=7))
