"""Scaling-efficiency evidence for the north rule: run the SAME job at
N and 4N parallelism (local[8] vs local[32]), fresh JVM each, identical
input, and write BENCH/BASELINE.md.

efficiency = (throughput(4N) / throughput(N)) / 4   — target ≥ 0.8

Evidence protocol (per VERDICT r1: "the bar is evidence, not argument"):

* best-of-5 wall-clock for the compute phase, best-of-3 for the full
  pass, ALL reps reported;
* task-level executorCpuTime / executorRunTime from the Spark status
  REST API at both levels — CPU totals prove work conservation (the 4N
  run does the same work, not less), run/wall proves achieved
  parallelism;
* -XX:ActiveProcessorCount pins each JVM to its nominal core count so
  local[8] behaves like an 8-core node (GC/JIT/Netty pools included)
  instead of borrowing the host's 32 cores.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: transcripts scale for the scaling evidence: 6M turns (sf1) so the
#: pass is compute-bound; at sf0.1 (600k turns, ~100MB parquet)
#: wall-clock is fixed overhead and no parallelism level can help
SCALE_SF = os.environ.get("SPARK_GRAFT_TRANSCRIPTS_SF", "sf1")


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_TRANSCRIPTS_SF=SCALE_SF)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_run.py")],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"scaling_run failed at {cpus} cpus:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def fmt_reps(reps):
    return ", ".join(f"{r['wall_s']}" for r in reps)


def main():
    n, four_n = 8, 32
    r_n = run_at(n)
    r_4n = run_at(four_n)

    rows = r_n["n_rows"]
    c_n, c_4n = r_n["compute"], r_4n["compute"]
    f_n, f_4n = r_n["full"], r_4n["full"]
    c_eff = (c_4n["turns_per_sec"] / c_n["turns_per_sec"]) / (four_n / n)
    f_eff = (f_4n["turns_per_sec"] / f_n["turns_per_sec"]) / (four_n / n)
    # achieved parallelism: executor run-time per wall-clock second
    par_n = c_n["run_s_at_best"] / c_n["best_wall_s"] if c_n["best_wall_s"] else 0
    par_4n = c_4n["run_s_at_best"] / c_4n["best_wall_s"] if c_4n["best_wall_s"] else 0
    cpu_ratio = (c_4n["cpu_s_at_best"] / c_n["cpu_s_at_best"]
                 if c_n["cpu_s_at_best"] else 0)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling evidence (north rule)

Same job over the identical deterministic {SCALE_SF} transcripts input
({rows:,} turns, seed=42, one hot conversation), fresh JVM per level
with `-XX:ActiveProcessorCount=<cores>` (so the N-core run behaves like
an N-core node, GC/JIT pools included), one warm-up pass, best-of-N
timing with every rep reported, and task-level executor metrics from
the Spark status REST API.

## Compute phase (compiled validation projection + aggregate — the
data-proportional work)

| parallelism | best wall (s) | all reps (s) | turns/sec | executor CPU (s) | executor run (s) | achieved parallelism (run/wall) |
|---|---|---|---|---|---|---|
| local[{n}] (N) | {c_n['best_wall_s']} | {fmt_reps(c_n['reps'])} | {c_n['turns_per_sec']:,} | {c_n['cpu_s_at_best']} | {c_n['run_s_at_best']} | {par_n:.1f} |
| local[{four_n}] (4N) | {c_4n['best_wall_s']} | {fmt_reps(c_4n['reps'])} | {c_4n['turns_per_sec']:,} | {c_4n['cpu_s_at_best']} | {c_4n['run_s_at_best']} | {par_4n:.1f} |

**Compute-phase scaling efficiency = (thr_4N / thr_N) / 4 = {c_eff:.3f}**  (target ≥ 0.8)

Work conservation: executor CPU total at 4N / at N = {cpu_ratio:.2f}
(≈1.0 means the 4N run did the same computation, i.e. the speedup is
parallelism, not work elision).

## Full pass (rules + uniqueness + referential + ordering + drift +
checkpointed writes — ~10 Spark jobs incl. file commits)

| parallelism | best wall (s) | all reps (s) | turns/sec | executor CPU (s) | executor run (s) | failed turns |
|---|---|---|---|---|---|---|
| local[{n}] (N) | {f_n['best_wall_s']} | {fmt_reps(f_n['reps'])} | {f_n['turns_per_sec']:,} | {f_n['cpu_s_at_best']} | {f_n['run_s_at_best']} | {f_n['n_failed']} |
| local[{four_n}] (4N) | {f_4n['best_wall_s']} | {fmt_reps(f_4n['reps'])} | {f_4n['turns_per_sec']:,} | {f_4n['cpu_s_at_best']} | {f_4n['run_s_at_best']} | {f_4n['n_failed']} |

**Full-pass scaling efficiency = {f_eff:.3f}**  (failed-turn counts identical
at both levels: {f_n['n_failed'] == f_4n['n_failed']})

## Reading

The compute phase is the part that grows with data; its efficiency is
the number that predicts 100 TB behavior (at 10^6× more data per job
the full pass IS the compute phase — the fixed orchestration costs
visible in the full-pass rows amortize to zero).  The full-pass numbers
are reported unfiltered, including driver-side job scheduling and
parquet commit costs that do not parallelize at this toy scale.

Reference single-core baseline (BASELINE.md): ~2,200 turns/s for the
flat transcript rule-set alone (no uniqueness/referential/drift).

Raw per-level JSON:

```json
{json.dumps(r_n)}
{json.dumps(r_4n)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
