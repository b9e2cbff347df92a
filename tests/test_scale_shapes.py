"""Scale-stress shapes for the dedup/ANN family (VERDICT r7 ask #6).

Three claims the 100 TB story rests on, each pinned here:

1. **Partition-count invariance** — the family returns identical
   results when ``spark.sql.shuffle.partitions`` is forced to 512
   (the cluster-sized setting) instead of the test default 8. A query
   whose output depends on partitioning (e.g. a non-deterministic
   tiebreak hiding behind a single-partition accident) fails this.

2. **Hot-key skew stays bounded** — an artificially hot LSH band
   (hundreds of identical vectors, colliding in EVERY band) must not
   change the plan shape (no new shuffle exchanges) and the per-key
   candidate work must stay exactly band-bounded: C(hot,2) pairs from
   the hot bucket, each emitted ONCE (the first-colliding-band
   contract), never re-amplified by band count.

3. **No task dominates** — with 512 shuffle partitions at sf0.1, no
   task in any stage of the heavy dedup queries may run >10x the
   stage's median task time (median floored at 100 ms, so stages whose
   tasks are pure scheduling overhead never trip on a JIT/GC hiccup).
   Measured from Spark's event log in a dedicated subprocess session
   (the shared test session has the UI and event log off).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from bristle_spark.registry import all_specs

SCALE_FAMILY = [
    "l_dedup_minhash",
    "l_dedup_embedding",
    "l_dedup_ngram_jaccard",
    "l_ann_lsh",
    "l_ann_knn_join",
    # round-8 session-2: pair mining, iterative graph/trainer, sketches
    "r_market_basket",
    "r_mode_per_group",
    "l_count_min",
    "l_pagerank",
    "r_bitmap_distinct",
    "l_poisson_bootstrap",
    # round-8 third wave: blocked-SNM lead() pairs, inverted-index
    # dot-product top-k, ECDF-grid pair sup
    "l_dedup_sorted_neighborhood",
    "l_sparse_cosine_topk",
    "l_ks_test",
    # round-10 (VERDICT r9 ask #6): prefix-blocked Levenshtein pairs,
    # delta-pruned MV repair
    "l_edit_distance_dedup",
    "r_mv_late_update",
    # round-11 (VERDICT r10 ask #6): the r10 heavy additions — bounded
    # broadcast-probe NDCG, source-pair JS divergence, row-local
    # skip-gram pair generation over a persisted counts frame
    "l_ndcg_eval",
    "l_js_divergence",
    "l_skipgram_cooccurrence",
    # round-11 png-codec keys: partition-local codec passes + the
    # banded phash join must stay partition-invariant
    "m_png_pixel_stats",
    "m_png_phash_dedup",
    # round-11 session-2: codec-fed gradient stats, exact fixed-point
    # decay weights, decimal-exact Pearson, counts-frame re-aggregation
    "m_png_edge_density",
    "r_exp_decay_avg",
    "r_autocorrelation",
    "l_hapax_ratio",
    "l_curriculum_order",
    "l_duplicate_spans",
    "r_summap",
    "l_k_anonymity",
    # round-12: the promoted real-PNG twins — codec passes are
    # partition-local, results must not depend on the partition knob
    "m_png_binary_features",
    "m_png_frame_sample",
    "m_png_scene_cut",
    "m_png_patchify",
    "m_jpeg_pixel_stats",
    "m_jpeg_resize",
    "m_png_augment",
    "l_source_overlap",
    # round-12 session-2: degree-oriented triangle join, pointer-doubled
    # closure, TakeOrdered PPS sample, bounded-domain allocation, and the
    # JPEG-fed banded phash join — all must ignore the partition knob
    "l_graph_triangles",
    "r_recursive_hierarchy",
    "l_seq_poisson_sample",
    "r_largest_remainder_alloc",
    "m_jpeg_phash_dedup",
    "l_rendezvous_shard",
    # round-12 session-3: rank windows, bounded contingency/bucket
    # frames, per-user lag rollup, bit aggregates, row-local v6 codec
    "r_mann_whitney",
    "r_spearman_corr",
    "r_cramers_v",
    "r_counter_rate",
    "r_lttb_downsample",
    "r_bit_aggregates",
    "t_ipv6_codec",
    "l_rank_biased_overlap",
    "r_topk_others",
    "r_histogram_equi_depth",
    "r_window_funnel_strict",
    "t_fixed_string_codec",
    "t_datetime64_codec",
    "r_mann_kendall",
    "l_bloom_fpp_eval",
    "m_png_hist_equalize",
    "l_silhouette_by_label",
    "l_centroid_drift",
    "l_retrieval_mrr",
    "r_geohash_encode",
    "r_point_in_polygon",
    "r_spatial_grid_join",
    "r_uniq_up_to",
    "t_tuple_codec",
    "r_runs_test",
    "t_date32_codec",
    # round-13: the 4:2:0 color-JPEG codec pass is partition-local;
    # the tau grid / dictionary / canonical-URL group are bounded or
    # map-side-combined frames the partition knob must not touch
    "m_jpeg_rgb_stats",
    "r_kendall_tau",
    "t_lowcardinality_codec",
    "t_map_codec",
    "l_dedup_url",
    "r_geo_distance",
    "r_skyline",
    "l_ann_list_balance",
    "t_array_codec",
    "r_conversion_wilson_ci",
    "r_anova_oneway",
    "r_levene_brown_forsythe",
    "r_cuped_variance_reduction",
    # round-14: the checker-JPEG AC codec pass is partition-local like
    # its constant-block siblings; the stats quartet reduces to bounded
    # frames (|types| x groups, |segments| x buckets) the partition
    # knob must not touch
    "m_jpeg_ac_stats",
    "r_kruskal_wallis",
    "r_benjamini_hochberg",
    "r_bollinger_bands",
    "r_survival_km",
    "l_sq8_quantize_error",
    "r_srm_check",
    "s_stream_srm",
    "r_peak_detection",
    "r_rolling_corr",
    "r_power_analysis",
    "r_allen_intervals",
    "l_temperature_mix",
    "r_winsorize",
    "m_wav_silence_trim",
    "r_did_estimator",
    "r_did_pretrend",
    # round-15: the all-component checker JPEG is partition-local like
    # every codec key; the k-means contract reduces to k + 1 bounded
    # frames the partition knob must not touch
    "m_jpeg_chroma_ac",
    "l_ivf_train_kmeans",
    # round-15 cont.: the Holt fold runs on |types| bounded lists and
    # the assortativity moments are one single-row aggregation — the
    # partition knob must not touch either
    "r_holt_trend",
    "l_graph_assortativity",
    "m_jpeg_region_count",
    # round-15 cont.: the burn-rate windows are a broadcast range
    # self-join of the bounded hourly frame — partition-knob-invariant
    "r_slo_burn_rate",
    # round-15 cont.: snippet windows are doc-partitioned over the
    # broadcast-filtered hit frame — partition-knob-invariant
    "l_snippet_extract",
    "m_wav_resample",
    "s_stream_slo_burn",
]

# The r8/r9 heavy hitters whose bucketing contract is the whole scale
# story: their plan's exchange count must not depend on the
# shuffle-partition setting (a plan that grows exchanges at cluster
# partition counts is re-planning itself into extra shuffles).
PLAN_PIN_FAMILY = [
    "l_sparse_cosine_topk",
    # round-12 (VERDICT r11 ask #6): the second df-cap/bounded-key
    # sparse-similarity query joins the family
    "l_source_overlap",
    "l_edit_distance_dedup",
    "r_market_basket",
    "r_mv_late_update",
    # round-11 (VERDICT r10 ask #6)
    "l_ndcg_eval",
    "l_js_divergence",
    "l_skipgram_cooccurrence",
    # round-11 session-2: the decay agg must stay one exchange + one
    # broadcast anchor; the hapax counts-table re-agg must not add a
    # shuffle when the partition knob moves
    "r_exp_decay_avg",
    "l_hapax_ratio",
    # the composed-offset global ordering must keep its exchange count
    # when the partition knob moves (no re-planned global sort)
    "l_curriculum_order",
    # round-12 session-3: bounded-frame analytics — the partition knob
    # must never add a shuffle to these
    "r_mann_kendall",
    "r_cramers_v",
    "r_topk_others",
    "r_lttb_downsample",
    "l_rank_biased_overlap",
    "r_window_funnel_strict",
    # round-14 (VERDICT r13 ask #7): the skyline dominance window's
    # exchange count must not depend on the partition knob
    "r_skyline",
    # round-14 stats/monitoring family: all reduce to bounded frames
    # (map-side-combined rollups, broadcast joins, |types|-row tails) —
    # the partition knob must never add a shuffle to any of them
    "r_kruskal_wallis",
    "r_benjamini_hochberg",
    "r_bollinger_bands",
    "r_survival_km",
    "r_srm_check",
    "r_power_analysis",
    "r_allen_intervals",
    "l_sq8_quantize_error",
    "r_peak_detection",
    "r_rolling_corr",
    "l_temperature_mix",
    "r_winsorize",
    "r_did_estimator",
    "r_did_pretrend",
]

# Absolute shuffle-count pins for the sparse-similarity family
# (VERDICT r11 ask #6): these two queries' whole 100 TB story is "the
# df-cap / bounded-source-count keeps the candidate join linear in
# shingle volume", and the number of hash-partitioning exchanges IS
# that contract — a regression that adds (or re-plans away) a shuffle
# must fail loudly, not just stay partition-invariant.
SPARSE_SIMILARITY_SHUFFLE_PINS = {
    # r15 optimization: the df cap became a count window over the hs
    # partition and the pruned postings are persisted, so the
    # tokenize/shingle subtree (2 exchanges) executes ONCE and the plan
    # string shows it nested under each InMemoryTableScan reprint.
    # Executed exchanges: 2 (cached subtree) + 1 dots agg + 2 norm aggs;
    # the string count below includes the cached-plan reprints.
    "l_sparse_cosine_topk": 11,
    # r15: row-local array shingles carrying source (no per-doc
    # distinct, no doc_id join, no doc_id window) + persisted
    # source-level distinct; was 13.
    "l_source_overlap": 7,
}

# Absolute single-exchange pins (round-12 session-3): each of these
# keys' docstring claims Catalyst satisfies the window partitioning AND
# the downstream groupBy with ONE hash exchange (the grouping keys are
# a superset of — or equal to — the window partition keys, and
# HashPartitioning on a subset satisfies ClusteredDistribution).  That
# claim IS the 100 TB story (the corpus is shuffled exactly once), so
# it fails loudly if a refactor re-keys a window or splits the
# aggregation.
SINGLE_EXCHANGE_PINS = [
    "r_counter_rate",
    "r_histogram_equi_depth",
    "r_mann_whitney",
    "r_spearman_corr",
    "r_bit_aggregates",
]

HOT_COPIES = 300  # rows in the artificially hot band


@pytest.fixture(scope="module")
def specs():
    return all_specs()


@pytest.mark.parametrize("name", SCALE_FAMILY)
def test_partition_count_invariance(name, spark, sf_dir, specs):
    """512 shuffle partitions must give byte-identical results to 8."""
    fn = specs[name].fn
    baseline = sorted(map(tuple, fn(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    try:
        wide = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert wide == baseline


@pytest.mark.parametrize("name", PLAN_PIN_FAMILY)
def test_exchange_count_invariant_to_partition_setting(name, spark, sf_dir, specs):
    """8 vs 512 shuffle partitions must produce the same number of
    shuffle exchanges — the partition knob sizes the shuffle, it must
    never add one (VERDICT r9 ask #6)."""
    fn = specs[name].fn

    def exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange ")

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        at_8 = exchanges(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "512")
        at_512 = exchanges(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert at_8 == at_512


@pytest.mark.parametrize("name", SINGLE_EXCHANGE_PINS)
def test_single_exchange_pinned(name, spark, sf_dir, specs):
    """The corpus is shuffled exactly once: window partition keys are
    reused by the downstream aggregation (see SINGLE_EXCHANGE_PINS)."""
    spark.catalog.clearCache()
    df = specs[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, name


@pytest.mark.parametrize(
    "name", sorted(SPARSE_SIMILARITY_SHUFFLE_PINS)
)
def test_sparse_similarity_shuffle_count_pinned(name, spark, sf_dir, specs):
    """The exact hash-partitioning exchange count of the sparse-
    similarity plans is a contract (the docstrings state the blowup
    bound these shuffles implement); update the pin ONLY with a plan
    change that keeps the linear-in-shingle-volume bound.

    Cache-clean slate first: other keys in the suite persist shared
    plan fragments (bisected to l_minhash_error's persisted shingle
    frame), and Spark's cache manager substitutes InMemoryRelation into
    any later plan containing that subtree — 13 exchanges became 17
    with an InMemoryTableScan, making the absolute pin order-dependent
    (r12 verify_all shard0)."""
    spark.catalog.clearCache()
    df = specs[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == (
        SPARSE_SIMILARITY_SHUFFLE_PINS[name]
    )


@pytest.fixture(scope="module")
def hot_band_dir(tmp_path_factory, request):
    """A tmp sf_dir whose embeddings table has one artificially hot
    LSH band: HOT_COPIES exact copies of one vector under fresh ids,
    colliding in all 4 bands, appended to the real table."""
    spark = request.getfixturevalue("spark")
    sf_dir = request.getfixturevalue("sf_dir")
    out = tmp_path_factory.mktemp("hot_band")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base_id = e.agg(F.max("vec_id")).collect()[0][0] + 1
    one = e.orderBy("vec_id").limit(1).collect()[0]
    hot = spark.range(HOT_COPIES).select(
        (F.col("id") + base_id).alias("vec_id"),
        F.lit(one["embedding"]).alias("embedding"),
        *[
            F.lit(one[c]).alias(c)
            for c in e.columns
            if c not in ("vec_id", "embedding")
        ],
    )
    e.unionByName(hot.select(e.columns)).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


def test_hot_band_plan_shape_unchanged(spark, sf_dir, hot_band_dir, specs):
    """The skewed table must not change the exchange count of the plan."""
    fn = specs["l_dedup_embedding"].fn

    def exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    assert exchanges(fn(spark, hot_band_dir)) == exchanges(fn(spark, sf_dir))


def test_hot_band_work_is_band_bounded(spark, hot_band_dir, specs):
    """The hot bucket contributes exactly C(hot_cluster, 2) candidate
    pairs — emitted once each (first-colliding-band), not once per
    band — and the query still completes with a full top-k of exact
    duplicates."""
    from bristle_spark.queries import dedup as D

    e = spark.read.parquet(f"{hot_band_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    keyed = e.select(
        "vec_id",
        *[D._emb_band_key(F.col("v"), j).alias(f"k{j}") for j in range(D.EMB_BANDS)],
    )
    # the hot cluster (original + copies) shares every band key
    hot_bucket = (
        keyed.groupBy(*[f"k{j}" for j in range(D.EMB_BANDS)])
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert hot_bucket >= HOT_COPIES + 1

    rows = specs["l_dedup_embedding"].fn(spark, hot_band_dir).collect()
    assert len(rows) == 20
    assert all(abs(r["cos_sim"] - 1.0) < 1e-9 for r in rows)

    # candidate pairs across ALL bands, counted with multiplicity 1:
    # the first-colliding-band join must yield exactly the distinct
    # collision set (no band-count amplification reaching the verify)
    bands = keyed
    conds = None
    for j in range(D.EMB_BANDS):
        c = F.col(f"x.k{j}") == F.col(f"y.k{j}")
        conds = c if conds is None else (conds | c)
    distinct_pairs = (
        bands.alias("x")
        .join(bands.alias("y"), conds & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select("x.vec_id", "y.vec_id")
        .distinct()
        .count()
    )
    hot_pairs = (HOT_COPIES + 1) * HOT_COPIES // 2
    assert distinct_pairs >= hot_pairs  # the hot clique is all there


_EVENTLOG_SCRIPT = r"""
import json, os, sys, glob
sys.path.insert(0, {repo!r})
from bristle_spark.session import get_spark
log_dir = sys.argv[1]
spark = get_spark(
    app_name="scale-task-balance",
    cpus=8,
    shuffle_partitions=512,
    extra_conf={{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "file://" + log_dir,
        "spark.eventLog.compress": "false",
    }},
)
from bristle_spark.registry import all_specs
specs = all_specs()
# warmup pass: JIT/codegen/parquet-footer caches are not skew; the
# gate measures the steady-state second pass only
for name in ["l_dedup_minhash", "l_dedup_embedding", "l_sparse_cosine_topk"]:
    specs[name].fn(spark, {sf!r}).collect()
import time
t_warm = int(time.time() * 1000)
for name in ["l_dedup_minhash", "l_dedup_embedding", "l_sparse_cosine_topk"]:
    specs[name].fn(spark, {sf!r}).collect()
app_id = spark.sparkContext.applicationId
spark.stop()
durs = {{}}
# Spark 4 rolling event log v2: a directory eventlog_v2_<appid>
# holding events_*_<appid> files (plus an appstatus marker)
paths = [p for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
         if os.path.isfile(p) and app_id in p and "appstatus" not in os.path.basename(p)]
for path in paths:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {{}})
                if ti.get("Launch Time", 0) < t_warm:
                    continue
                d = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                durs.setdefault(sid, []).append(d)
print("TASKDURS " + json.dumps(durs))
"""


def test_no_task_dominates_at_512_partitions(tmp_path):
    """Event-log-measured task balance: in every stage of the three
    heaviest bucketed queries at sf0.1 with 512 shuffle partitions, the
    slowest task is <= 10x the stage median (median floored at
    100 ms).  Only the warmed SECOND pass is measured — a cold JVM's
    first-wave JIT/codegen stalls produced 8s stragglers that are
    startup noise, not key skew (r8: observed flaky under load)."""
    log_dir = str(tmp_path / "eventlog")
    os.makedirs(log_dir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _EVENTLOG_SCRIPT.format(repo=repo, sf="/root/testdata/sf0.1")
    proc = subprocess.run(
        [sys.executable, "-c", script, log_dir],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "BRISTLE_DRIVER_MEM": "8g"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("TASKDURS ")
    )
    durs = json.loads(line[len("TASKDURS "):])
    assert durs, "no task metrics captured"
    offenders = []
    for sid, times in durs.items():
        times = sorted(times)
        if len(times) < 4:
            continue
        # floor the median at 100 ms: when 512 partitions spread sf0.1
        # so thin that the median task is pure scheduling overhead, a
        # single JIT/GC hiccup is not a skew signal — the ratio only
        # means "a key dominated" when the median task did real work
        median = max(times[len(times) // 2], 100)
        worst = times[-1]
        if worst > 10 * median:
            offenders.append((sid, median, worst, len(times)))
    assert offenders == [], f"dominating tasks: {offenders}"


# ---------------------------------------------------------------------------
# Skyline family scale gates (VERDICT r13 ask #7): the 100 TB claim is
# "ONE event_type-partitioned running-max window, never global, and a
# front-of-fronts merge that equals the global front".  The docstrings
# stated it; these pin it.


def test_skyline_windows_partition_by_event_type(spark, sf_dir, specs):
    """Every Window node in r_skyline's executed plan must key its
    partition spec on event_type — a global (or differently-keyed)
    window would funnel the corpus into one task at scale."""
    from bristle_spark import plans

    df = specs["r_skyline"].fn(spark, sf_dir)
    assert plans.unpartitioned_windows(df) == []
    plan = plans.plan_string(df, "simple")
    window_lines = [
        ln for ln in plan.splitlines() if ln.lstrip().startswith(("Window ", "+- Window", ":- Window"))
        or " Window [" in ln
    ]
    assert window_lines, "plan has no Window nodes — the operator changed shape"
    for ln in window_lines:
        assert "event_type" in ln, f"Window not partitioned by event_type: {ln}"


def _front_is_dominance_free(rows) -> bool:
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["value_cents"], r["day_idx"])
        )
    for pts in by_type.values():
        for i, (v1, d1) in enumerate(pts):
            for j, (v2, d2) in enumerate(pts):
                if i != j and v2 >= v1 and d2 >= d1 and (v2 > v1 or d2 > d1):
                    return False
    return True


def test_skyline_monster_type_keeps_plan_shape(spark, sf_dir, specs, tmp_path):
    """Skew stress: one event type inflated 50x (fresh event_ids) must
    not change the exchange count — the dominance window absorbs a
    monster partition without re-planning — and the output must stay
    an actual Pareto front (no dominated survivors)."""
    from bristle_spark import plans

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base_id = ev.agg(F.max("event_id")).collect()[0][0] + 1
    one_type = ev.orderBy("event_type").limit(1).collect()[0]["event_type"]
    monster = (
        ev.filter(F.col("event_type") == one_type)
        .crossJoin(spark.range(50).select(F.col("id").alias("rep")))
        .select(
            (F.col("event_id") * 50 + F.col("rep") + base_id).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
    )
    out = str(tmp_path / "events.parquet")
    ev.select(monster.columns).unionByName(monster).write.parquet(out)

    fn = specs["r_skyline"].fn
    baseline = plans.exchange_count(fn(spark, sf_dir))
    skewed_df = fn(spark, str(tmp_path))
    assert plans.exchange_count(skewed_df) == baseline
    rows = skewed_df.collect()
    assert rows and _front_is_dominance_free(rows)


def test_skyline_front_of_fronts_merge_is_exact(spark, sf_dir, specs):
    """The streaming twin's whole correctness-at-scale story:
    front(front(A) ∪ front(B)) == front(A ∪ B), including the
    keep-lowest-event_id representative rule, and the merge result is
    partition-count invariant (8 vs 512)."""
    from bristle_spark.queries.analytic import skyline_front, skyline_points

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = skyline_points(ev)
    a = pts.filter(F.col("event_id") % 2 == 0)
    b = pts.filter(F.col("event_id") % 2 == 1)
    merged = skyline_front(skyline_front(a).unionByName(skyline_front(b)))
    direct = skyline_front(pts)
    key = lambda r: (r["event_type"], r["event_id"], r["vc"], r["day"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, direct.collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    try:
        wide = sorted(map(key, merged.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert wide == sorted(map(key, direct.collect()))
