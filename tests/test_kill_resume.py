"""True kill/resume test (FIXTURES.md §4.5): SIGKILL a tiler run partway,
resume in a fresh process, assert the union is byte-identical to an
uninterrupted run. Runs real subprocesses (own Ray sessions)."""
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

from grandine_ray.sources import synth

RUNNER = """
import sys, ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from grandine_ray.pipelines.tiler import run_tiler, finalize_job
import time
t0 = time.time()
m = run_tiler(sys.argv[1], out_dir=sys.argv[2], zooms=[0, 2, 4, 6])
finalize_job(m, sys.argv[2], wall_s=time.time() - t0)
print("DONE")
"""


def _run(docs, out, timeout=None):
    p = subprocess.Popen(
        [sys.executable, "-c", RUNNER, docs, out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo",
    )
    try:
        out_s, _ = p.communicate(timeout=timeout)
        return p.returncode, out_s
    except subprocess.TimeoutExpired:
        p.send_signal(signal.SIGKILL)
        p.wait()
        return -9, ""


def _run_crash_after(docs, out, n_parts: int):
    """Run with the deterministic checkpoint-count crash hook armed:
    the job dies (leaving a torn .tmp data file) once ≥n_parts
    partition manifests are durable — no wall-clock race, asserts on
    every machine speed."""
    env = dict(os.environ, GRAFT_KILL_AFTER_PARTITIONS=str(n_parts))
    p = subprocess.Popen(
        [sys.executable, "-c", RUNNER, docs, out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo", env=env,
    )
    out_s, _ = p.communicate(timeout=300)
    return p.returncode, out_s


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    corpus = synth.ensure_corpus(3000)
    docs = synth.docs_path(corpus)

    # uninterrupted reference run
    full = str(tmp_path / "full")
    rc, out = _run(docs, full)
    assert rc == 0 and "DONE" in out
    done_parts = sorted(os.listdir(f"{full}/manifest"))
    # determinism guarantee needs more partitions than the runner's 4
    # CPU slots: some writer task then necessarily STARTS after the
    # first manifest is durable and trips the hook
    assert len(done_parts) > 4

    # interrupted run: the crash hook fires deterministically once the
    # first partition manifest is durable, mid-write of a later one
    partial = str(tmp_path / "partial")
    rc, out = _run_crash_after(docs, partial, n_parts=1)
    assert rc != 0 and "DONE" not in out
    n = len(os.listdir(f"{partial}/manifest"))
    assert 0 < n < len(done_parts), (n, len(done_parts))
    # the simulated kill left a torn tmp data file behind
    assert any(f.endswith(".tmp")
               for f in os.listdir(f"{partial}/tiles"))

    # resume and compare byte-for-byte per partition
    rc, out = _run(docs, partial)
    assert rc == 0 and "DONE" in out
    assert sorted(os.listdir(f"{partial}/manifest")) == done_parts
    for p in done_parts:
        pid = p[:-5]  # strip .json
        t1 = pq.read_table(f"{full}/tiles/{pid}.parquet")
        t2 = pq.read_table(f"{partial}/tiles/{pid}.parquet")
        assert t1.equals(t2), f"partition {pid} differs after kill/resume"
    # job metrics written
    job = json.load(open(f"{partial}/JOB.json"))
    assert job["partitions"] == len(done_parts)
    assert job["tiles"] > 0
