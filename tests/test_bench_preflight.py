"""Pre-flight steal probe (bench.py, round 12 — VERDICT r11 #1).

No Spark session: the probe runs before Spark startup by design, so
these tests exercise it exactly as bench.py main() does, just with a
tiny rep/proc count to stay fast. Discrimination against real
known-quiet/known-noisy windows is a measurement, not a unit test —
those numbers live in BASELINE.md rule 6.
"""

import bench


def test_probe_shape_and_quiet_window_sanity():
    m = bench._preflight_probe(reps=2, procs=2)
    assert set(m) >= {
        "median_rep_wall_sec",
        "rep_wall_range",
        "steal_ratio",
        "steal_ratio_p90",
        "abs_multiplier",
        "anchor_sec",
        "procs",
        "reps",
    }
    # ratio is a physical lower bound: wall >= thread CPU for a
    # CPU-bound loop (up to clock granularity)
    assert m["steal_ratio"] >= 0.99
    assert m["steal_ratio_p90"] >= m["steal_ratio"]
    assert m["rep_wall_range"][0] <= m["median_rep_wall_sec"]
    assert m["median_rep_wall_sec"] <= m["rep_wall_range"][1]
    assert m["anchor_sec"] == bench.PREFLIGHT_ANCHOR_SEC


def test_hot_rule_each_term_is_load_bearing():
    quiet = {
        "steal_ratio": 1.0,
        "steal_ratio_p90": 1.02,
        "abs_multiplier": 0.95,
    }
    assert not bench._preflight_hot(quiet)
    # median ratio over the line
    assert bench._preflight_hot({**quiet, "steal_ratio": 1.31})
    # p90 over the line with a clean median — the calibrated 32-hog
    # signature (median 1.17, p90 2.0): the tail term must fire alone
    assert bench._preflight_hot({**quiet, "steal_ratio_p90": 2.0})
    # absolute multiplier over its LOOSER line (frequency-cap backstop)
    assert not bench._preflight_hot({**quiet, "abs_multiplier": 1.4})
    assert bench._preflight_hot({**quiet, "abs_multiplier": 1.51})


def test_thresholds_are_the_documented_rule():
    # BASELINE.md rule 6 documents 1.3x ratio (median AND p90) / 1.5x
    # absolute; a silent constant change must fail a test, not just
    # drift the docs.
    assert bench.PREFLIGHT_RATIO_MAX == 1.3
    assert bench.PREFLIGHT_ABS_MAX == 1.5


# --- In-suite burst attribution (round 13, VERDICT r12 #2) ----------------


def test_burst_sample_physical_bound():
    import multiprocessing as mp

    with mp.Pool(bench.BURST_PROCS) as pool:
        r = bench._burst_sample(pool, loop_n=200_000)
    # wall >= thread CPU for a CPU-bound loop (up to clock granularity)
    assert r >= 0.99


def test_burst_hot_is_max_over_bracket():
    # a burst in EITHER surrounding window contaminates the run
    assert not bench._burst_hot([1.0, 1.05])
    assert bench._burst_hot([1.0, 1.31])
    assert bench._burst_hot([1.31, 1.0])
    assert not bench._burst_hot([1.3, 1.3])  # at the line is clean


def test_clean_runs_alignment():
    runs = [1.0, 5.0, 1.1]
    amb = [[1.0, 1.0], [1.0, 2.0], [1.01, 1.02]]
    assert bench._clean_runs(runs, amb) == [1.0, 1.1]


def test_anchor_eligible_burst_each_clause_load_bearing():
    names = ["a", "b"]
    ok = {"a": [1.0, 1.01, 1.02], "b": [2.0, 2.1, 2.05]}
    assert bench._anchor_eligible_burst(ok, names)
    # clean-count clause: one query short of BURST_CLEAN_TARGET
    assert not bench._anchor_eligible_burst(
        {**ok, "b": [2.0, 2.1]}, names
    )
    # clean-spread clause: instability the samplers did NOT catch
    # (sub-sample bursts, plan nondeterminism) must still block
    assert not bench._anchor_eligible_burst(
        {**ok, "b": [2.0, 2.1, 3.0]}, names
    )
    # a missing query can never promote
    assert not bench._anchor_eligible_burst(ok, ["a", "b", "c"])


def test_burst_thresholds_are_the_documented_rule():
    # BASELINE.md rule 7 documents 1.3x ratio / 3 clean samples; a
    # silent constant change must fail a test, not just drift the docs
    assert bench.BURST_RATIO_MAX == 1.3
    assert bench.BURST_CLEAN_TARGET == 3
    # rule 7b: 0.05 is empirical — steal share under-measures total
    # interference (cache/membw contention rides along), so the line
    # sits far below the 1.3x-dilation spin rule; quiet baseline
    # < 0.02 and sub-0.1-share samples measured 0.4-1.2x clean spread
    assert bench.STEAL_SHARE_MAX == 0.05


# --- Rule 7b: vCPU-steal attribution (round 13, second half) --------------


def test_parse_cpu_jiffies_busy_and_steal():
    # user nice system idle iowait irq softirq steal guest gnice
    line = "cpu  100 2 30 9000 50 3 5 40 0 0"
    busy, steal = bench._parse_cpu_jiffies(line)
    assert busy == 100 + 2 + 30 + 3 + 5  # idle/iowait excluded
    assert steal == 40


def test_parse_cpu_jiffies_no_steal_field():
    # pre-2.6.11 shape (7 fields): steal defaults to 0, not IndexError
    busy, steal = bench._parse_cpu_jiffies("cpu 100 0 30 9000 50 3 5")
    assert busy == 138 and steal == 0


def test_cpu_counters_reads_this_host():
    busy, steal = bench._cpu_counters()
    assert busy > 0 and steal >= 0


def test_steal_share():
    assert bench._steal_share((1000, 10), (1100, 10)) == 0.0
    # 50 stolen vs 100 busy jiffies across the run -> share 1/3
    assert bench._steal_share((1000, 10), (1100, 60)) == round(
        50 / 150, 4
    )
    # counter unavailable (both zero) or no activity -> 0.0, never NaN
    assert bench._steal_share((0, 0), (0, 0)) == 0.0


def test_run_hot_is_spin_or_steal():
    assert not bench._run_hot([1.0, 1.05], 0.02)
    assert bench._run_hot([1.0, 1.31], 0.0)  # spin rule alone
    assert bench._run_hot([1.0, 1.0], 0.06)  # steal rule alone
    assert not bench._run_hot([1.0, 1.0], 0.05)  # at the line is clean
    # -1.0 is the sampling-off sentinel: never hot
    assert not bench._run_hot([1.0, 1.0], -1.0)


def test_ambient_steal_rate_smoke():
    r = bench._ambient_steal_rate(sample_sec=0.1)
    assert isinstance(r, float) and r >= 0.0


def test_clean_runs_excludes_steal_hot():
    runs = [1.0, 5.0, 1.1]
    amb = [[1.0, 1.0], [1.0, 1.0], [1.01, 1.02]]
    shares = [0.01, 0.6, 0.0]
    assert bench._clean_runs(runs, amb, shares) == [1.0, 1.1]
    # shares omitted -> spin-only behaviour (back-compat)
    assert bench._clean_runs(runs, amb) == runs
