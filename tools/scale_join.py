"""Spatial-JOIN scaling probe: N vs 4N as MORE EXECUTOR JVMs.

The kernel probe (tools/scale_probe.py, orchestrated by bench.py)
models 4N executors as one JVM with 4x task threads — fine for the
python-UDF-heavy projection spine, whose workers are separate
processes.  The point-in-polygon JOIN is pure-JVM (cover-cell broadcast
equi-join + exact ray-cast as a Catalyst higher-order function, which
is interpreted and allocation-heavy), so inside ONE shared heap its
thread-scaling bottoms out at ~0.5-0.6 from GC contention — the
documented >8-threads-per-executor anti-pattern, not a dataflow limit.

A real cluster grows from N to 4N by adding executor JVMs, each with
its own heap.  This probe models exactly that:

  N  = 1 JVM,  local[2], pinned to 2 cpus, ROWS rows
  4N = 4 JVMs, local[2], pinned to 4 disjoint 2-cpu sets, ROWS rows
       each, launched concurrently

Efficiency = aggregate rows/sec of the 4 concurrent JVMs divided by
4x the single-JVM rate.  Every pass is printed (no retries, no
censoring); the median is the headline.

Usage: python tools/scale_join.py [passes=3] [rows=24000000]
"""

import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

WORKER = __file__.replace("scale_join.py", "scale_probe.py")
CPUSETS = ["0-1", "2-3", "4-5", "6-7"]


def run_one(cpuset: str, rows: int) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", cpuset, "python", WORKER, "2", str(rows), "join"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)


def rate_of(proc: subprocess.Popen) -> float:
    out, _ = proc.communicate(timeout=1200)
    m = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
    return float(m.split()[3])


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 24_000_000
    effs = []
    for p in range(passes):
        base = rate_of(run_one(CPUSETS[0], rows))
        procs = [run_one(c, rows) for c in CPUSETS]
        rates = [rate_of(pr) for pr in procs]
        agg = sum(rates)
        eff = agg / (4.0 * base)
        effs.append(eff)
        print(f"pass {p}: 1-JVM {base:.0f} rows/s, "
              f"4-JVM agg {agg:.0f} rows/s "
              f"({', '.join(f'{r:.0f}' for r in rates)}), "
              f"efficiency {eff:.3f}", flush=True)
    effs_sorted = sorted(effs)
    med = effs_sorted[len(effs_sorted) // 2]
    print(f"JOIN-SCALING passes={effs} median={med:.3f}")


if __name__ == "__main__":
    main()
