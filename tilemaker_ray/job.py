"""`ray job submit` wrapper — the north rule's job surface.

Packages an engine run (`python -m tilemaker_ray ...`) as a Ray Job so
a killed run can be resubmitted and resume from its checkpoint
directory without recomputing completed tile partitions
(state/checkpoint.py skips finished partitions BEFORE the shuffle).

Two paths:
- cluster: with ``--address`` (or RAY_JOB_ADDRESS), submit through the
  public Ray Jobs API (``ray.job_submission.JobSubmissionClient``) with
  this package shipped via ``runtime_env.working_dir`` — the
  production path on a real cluster;
- local fallback: without an address (this sandbox has no dashboard,
  which the Jobs API requires), run the same entrypoint as a
  subprocess. The entrypoint string is identical either way, so the
  tested surface is the real one.

Usage:
    python -m tilemaker_ray.job --input pages.parquet --output out.mbtiles \
        --checkpoint-dir /tmp/ckpt [--address http://head:8265] [--wait]
"""

from __future__ import annotations

import json
import os
import shlex
import subprocess
import sys


def build_entrypoint(input_path: str, output: str,
                     checkpoint_dir: str | None = None,
                     config: str | None = None,
                     process: str | None = None,
                     bbox: str | None = None,
                     merge: bool = False,
                     threads: int | None = None) -> str:
    """The exact job entrypoint command (shared by both paths)."""
    parts = [sys.executable, "-m", "tilemaker_ray",
             "--input", input_path, "--output", output]
    if checkpoint_dir:
        parts += ["--checkpoint-dir", checkpoint_dir]
    if config:
        parts += ["--config", config]
    if process:
        parts += ["--process", process]
    if bbox:
        parts += ["--bbox", bbox]
    if merge:
        parts += ["--merge"]
    if threads:
        parts += ["--threads", str(threads)]
    return " ".join(shlex.quote(p) for p in parts)


def submit(entrypoint: str, address: str | None = None,
           working_dir: str | None = None, wait: bool = False) -> dict:
    """Submit the entrypoint. With an address → Ray Jobs API; without →
    local subprocess (same command). Returns a summary dict with
    ``job_id``/``status``."""
    if address:
        from ray.job_submission import JobStatus, JobSubmissionClient
        client = JobSubmissionClient(address)
        job_id = client.submit_job(
            entrypoint=entrypoint,
            runtime_env={"working_dir": working_dir
                         or os.path.dirname(os.path.dirname(__file__))})
        status = str(client.get_job_status(job_id))
        if wait:
            import time
            while True:
                s = client.get_job_status(job_id)
                if s in (JobStatus.SUCCEEDED, JobStatus.FAILED,
                         JobStatus.STOPPED):
                    status = str(s)
                    break
                time.sleep(2)
        return {"job_id": job_id, "status": status, "mode": "cluster"}
    # local fallback: same entrypoint, subprocess session
    proc = subprocess.run(shlex.split(entrypoint), capture_output=True,
                          text=True)
    out = proc.stdout.strip().splitlines()
    summary = {}
    for line in reversed(out):
        try:
            summary = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    return {"job_id": f"local-{os.getpid()}", "mode": "local",
            "status": "SUCCEEDED" if proc.returncode == 0 else "FAILED",
            "returncode": proc.returncode, "summary": summary,
            "stderr_tail": proc.stderr[-2000:] if proc.returncode else ""}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(prog="tilemaker_ray.job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None,
                   help="resume point: a resubmitted job skips finished"
                        " tile partitions recorded here")
    p.add_argument("--config", default=None)
    p.add_argument("--process", default=None)
    p.add_argument("--bbox", default=None)
    p.add_argument("--merge", action="store_true")
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--address", default=os.environ.get("RAY_JOB_ADDRESS"),
                   help="Ray dashboard address (http://head:8265); "
                        "omitted → run locally with the same entrypoint")
    p.add_argument("--wait", action="store_true")
    args = p.parse_args(argv)
    ep = build_entrypoint(args.input, args.output, args.checkpoint_dir,
                          args.config, args.process, args.bbox, args.merge,
                          args.threads)
    res = submit(ep, address=args.address, wait=args.wait)
    print(json.dumps(res))
    return 0 if res["status"] in ("SUCCEEDED", "PENDING", "RUNNING") else 1


if __name__ == "__main__":
    sys.exit(main())
