"""Anchor-refresh campaign driver (round 13, VERDICT r12 #1).

Runs bench.py attempts in a loop until one is promotable under either
anchor rule — v1 (`anchor_eligible`: zero unstable / zero requalified)
or the round-13 burst-aware v2 (`anchor_eligible_burst`: every query
has >= 3 burst-clean samples with clean spread inside the threshold —
BASELINE.md rule 7) — or the attempt budget runs out. Between
attempts it WAITS for the anchor load gates (pre-run loadavg <=
2.0/2.5/3.0) so attempts aren't burned on windows the mechanical rule
would reject anyway; bench.py's own preflight probe then filters
sustained steal (exit 2 = rejected attempt, ADVICE r12), and the
in-suite burst sampler attributes whatever arrives mid-suite.

Every attempt's full JSON is kept under OUT_DIR and a one-line summary
is appended to OUT_DIR/campaign.log — the committed campaign record.

    python tools/anchor_campaign.py [max_attempts] [max_hours]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "/tmp/anchor_campaign_r13"
GATE_1, GATE_5, GATE_15 = 2.0, 2.5, 3.0  # bench.py anchor_rule
POLL_SEC = 60
# Ambient-steal gate (round 13, rule 7b): co-tenant vCPU steal accrues
# in /proc/stat even while THIS guest idles (measured 0.15-0.8 stolen
# core/s during the hot evening windows vs < 0.01 when genuinely
# quiet), and loadavg cannot see it — attempts 1-5 all passed the
# loadavg gates and spiked anyway. Sampling steal for POLL_STEAL_SEC
# before committing an attempt skips doomed windows for ~10 s instead
# of a ~10 min suite, which is what actually preserves the attempt
# budget on a 25-attempt campaign.
POLL_STEAL_SEC = 10.0
STEAL_RATE_MAX = 0.05  # stolen core-sec per wall-sec, absolute


def loads():
    return tuple(round(x, 2) for x in os.getloadavg())


def gates_ok(ls) -> bool:
    return ls[0] <= GATE_1 and ls[1] <= GATE_5 and ls[2] <= GATE_15


def _steal_jiffies() -> int:
    try:
        with open("/proc/stat") as f:
            v = f.readline().split()[1:]
        return int(v[7]) if len(v) > 7 else 0
    except (OSError, ValueError, IndexError):
        return 0


def steal_rate(sample_sec: float = POLL_STEAL_SEC) -> float:
    """Stolen core-seconds per wall-second over a short idle sample
    (CLK_TCK is 100 on this kernel)."""
    s0 = _steal_jiffies()
    t0 = time.time()
    time.sleep(sample_sec)
    ds = _steal_jiffies() - s0
    dw = time.time() - t0
    return round(ds / 100.0 / dw, 3) if dw > 0 else 0.0


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(os.path.join(OUT_DIR, "campaign.log"), "a") as f:
        f.write(line + "\n")


def main() -> None:
    max_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    max_hours = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    os.makedirs(OUT_DIR, exist_ok=True)
    t_end = time.time() + max_hours * 3600
    attempt = 0
    while attempt < max_attempts and time.time() < t_end:
        ls = loads()
        if not gates_ok(ls):
            log(f"wait: loadavg {ls} over gates {GATE_1}/{GATE_5}/{GATE_15}")
            time.sleep(POLL_SEC)
            continue
        rate = steal_rate()
        if rate > STEAL_RATE_MAX:
            log(
                f"wait: ambient steal {rate} core/s over {STEAL_RATE_MAX} "
                f"(loadavg {ls} was under the gates)"
            )
            time.sleep(POLL_SEC - POLL_STEAL_SEC)
            continue
        attempt += 1
        log(f"attempt {attempt}: start at loadavg {ls}, steal {rate} core/s")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        out_path = os.path.join(OUT_DIR, f"attempt_{attempt:02d}.json")
        last = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        with open(out_path, "w") as f:
            f.write(last + "\n")
        if proc.returncode == 2:
            log(f"attempt {attempt}: preflight-rejected (exit 2)")
            continue
        if proc.returncode != 0 or not last:
            log(
                f"attempt {attempt}: FAILED rc={proc.returncode} "
                f"stderr tail: {proc.stderr.strip().splitlines()[-1:]}"
            )
            continue
        d = json.loads(last)
        q = d["qualification"]
        burst = q.get("burst")
        tagged = (
            sum(len(v) for v in burst["tagged_runs"].values())
            if isinstance(burst, dict)
            else -1
        )
        log(
            f"attempt {attempt}: value={d['value']} "
            f"value_clean={d.get('value_clean')} "
            f"unstable={len(q['unstable_queries'])} "
            f"requalified={len(q['requalified_queries'])} "
            f"tagged_runs={tagged} "
            f"burst_unstable={len(burst['burst_unstable']) if isinstance(burst, dict) else '-'} "
            f"v1={q['anchor_eligible']} v2={q.get('anchor_eligible_burst')}"
        )
        if q["anchor_eligible"] or q.get("anchor_eligible_burst"):
            log(
                f"attempt {attempt}: ANCHOR-ELIGIBLE "
                f"({'v1' if q['anchor_eligible'] else 'v2'}) — {out_path}"
            )
            return
    log(f"campaign over: {attempt} attempts, none eligible")
    sys.exit(3)


if __name__ == "__main__":
    main()
