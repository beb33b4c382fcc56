"""Benchmark harness.

Default: runs the flagship pages→tiles pipeline plus every driver query
over $GRAFT_SF_DIR (default /root/testdata/sf0.1) under
ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: runs the headline pipeline in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox evidence for the north
rule's N-vs-4N cluster criterion).

Pages input is generated once into /tmp (deterministic, cached) so the
timed run measures the pipeline, not synthesis.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _cpu_stat():
    """Aggregate jiffies from /proc/stat line 1 (user..steal)."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]
    except (OSError, ValueError):
        return None


def _steal_pct(a, b) -> float:
    """Hypervisor steal %% between two _cpu_stat samples. Loadavg
    guards are BLIND to a noisy VM neighbor (guest load stays low
    while 20%%+ of cycles vanish — observed on this host: steal 20.7%%
    during a 32-cpu burst turned a 13 s headline into 17-21 s with
    'contaminated: false'); steal is directly observable, so measure
    it around the timed window."""
    if a is None or b is None:
        return 0.0
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 2) if tot > 0 else 0.0


def run_bench() -> dict:
    import ray
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from tilemaker_ray.pipelines import flagship
    from tilemaker_ray.pipelines.queries import QUERIES
    from tilemaker_ray.sources import pages

    n_pages = int(os.environ.get("GRAFT_N_PAGES", "0")) \
        or pages.n_pages_for_sf_dir(sf_dir)
    pages_path = pages.ensure_pages_parquet(n_pages)

    # warm the page cache (untimed read) so we measure compute + shuffle
    rd.read_parquet(pages_path).count()
    # warm the worker pool (untimed 5k-page pipeline): Ray workers
    # import tilemaker_ray lazily on their first task, and that one-off
    # ~2-3 s import/startup cost otherwise lands inside the headline —
    # the 100-TB question is steady-state throughput, not session spin-up
    flagship.tiles_pipeline(rd.read_parquet(pages_path).limit(5000),
                            concurrency=max(2, num_cpus // 2)).count()

    stat0 = _cpu_stat()
    t0 = time.perf_counter()
    ds = rd.read_parquet(pages_path)
    tiles = flagship.tiles_pipeline(ds, concurrency=max(2, num_cpus // 2))
    n_tiles = tiles.count()
    headline = time.perf_counter() - t0
    steal_pct = _steal_pct(stat0, _cpu_stat())

    qtimes = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        QUERIES = {}
    for name, fn in QUERIES.items():
        if name == "flagship_tiles":
            continue  # the headline above IS this pipeline
        tq = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "count"):
            res.count()  # force execution
        qtimes[name] = round(time.perf_counter() - tq, 3)

    result = {
        "metric": ("end-to-end docs/sec: extract -> cell encode -> PIP join "
                   "-> tile shuffle -> MVT encode (pages table, sf-scaled)"),
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        "n_tiles": n_tiles,
        "docs_per_sec": round(n_pages / headline, 1),
        "steal_pct": steal_pct,
    }
    ray.shutdown()
    return result


def _wait_for_idle(max_load: float, timeout_s: float = 300.0) -> float:
    """Block until the host's 1-min loadavg decays below ``max_load``
    (or timeout). Returns the final loadavg. Round-2 lesson: scaling
    runs taken on a contended host scattered 0.70–1.08 and were
    unusable — refuse to measure into known contention."""
    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load > max_load and time.monotonic() - t0 < timeout_s:
        time.sleep(10.0)
        load = os.getloadavg()[0]
    return load


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs.

    Runs at 4× the per-round page count: the scaling criterion models a
    10¹²-row cluster job, where per-run fixed costs (session startup,
    shuffle barriers) are noise — at the default small input they
    dominate and measure the harness, not the pipeline.

    Each level waits for the host to go idle first (1-min loadavg
    below $GRAFT_MAX_LOAD, default 2.0) and records the pre-run load;
    if the host never settles, the result is marked
    ``contaminated: true`` so a noisy number is never mistaken for a
    measurement."""
    from tilemaker_ray.sources import pages as _pages
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n4 = _pages.n_pages_for_sf_dir(sf_dir) * 4
    max_load = float(os.environ.get("GRAFT_MAX_LOAD", "2.0"))

    reps = max(1, int(os.environ.get("GRAFT_SCALING_REPS", "1")))

    def one(ncpu: int) -> dict:
        """One leg = MIN wall time over ``reps`` runs. Host-neighbor
        noise only ever ADDS time (observed same-code efficiency
        scatter 0.66→1.18 purely by which leg caught a spike), so the
        per-leg min is a noise-robust estimator of the clean time;
        set GRAFT_SCALING_REPS=3 on noisy hosts."""
        best = None
        for _ in range(reps):
            pre = _wait_for_idle(max_load)
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_N_PAGES=str(n4),
                       # efficiency is computed from the headline only;
                       # the query sweep would just add noise per level
                       GRAFT_HEADLINE_ONLY="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            r["pre_load"] = round(pre, 2)
            # a neighbor can spike MID-leg (pre 0.4/1.98 but loadavg
            # 13 at finish → apparent efficiency 0.66 on an unchanged
            # pipeline). The 1-min loadavg at leg end includes our own
            # Ray workers, so subtract the CPUs this leg is entitled
            # to before comparing against the threshold.
            r["post_load_excess"] = round(
                max(0.0, os.getloadavg()[0] - ncpu), 2)
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    # loadavg can't see a hypervisor neighbor; steal during the timed
    # window can. A constant thief hits the WIDE leg proportionally
    # harder, so even a few percent fakes a low efficiency on an
    # unchanged pipeline.
    max_steal = float(os.environ.get("GRAFT_MAX_STEAL", "5.0"))
    steal_lo = r_lo.get("steal_pct", 0.0)
    steal_hi = r_hi.get("steal_pct", 0.0)
    return {
        "metric": "scaling efficiency (32 vs 8 cpus, same input)",
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "n_pages": r_hi["n_pages"],
        "pre_load_8": r_lo["pre_load"],
        "pre_load_32": r_hi["pre_load"],
        "post_excess_8": r_lo["post_load_excess"],
        "post_excess_32": r_hi["post_load_excess"],
        "steal_pct_8": steal_lo,
        "steal_pct_32": steal_hi,
        "max_load": max_load,
        "max_steal": max_steal,
        "reps_per_leg": reps,
        "contaminated": bool(r_lo["pre_load"] > max_load
                             or r_hi["pre_load"] > max_load
                             or r_lo["post_load_excess"] > max_load
                             or r_hi["post_load_excess"] > max_load
                             or steal_lo > max_steal
                             or steal_hi > max_steal),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
