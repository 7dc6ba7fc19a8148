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


def _run_kill_when_partial(docs, out, min_parts=1, deadline=120.0):
    """SIGKILL the run as soon as ≥min_parts manifest files exist."""
    p = subprocess.Popen(
        [sys.executable, "-c", RUNNER, docs, out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo",
    )
    mdir = os.path.join(out, "manifest")
    t0 = time.time()
    while time.time() - t0 < deadline:
        if p.poll() is not None:
            return p.returncode  # finished before we could kill
        n = len(os.listdir(mdir)) if os.path.isdir(mdir) else 0
        if n >= min_parts:
            p.send_signal(signal.SIGKILL)
            p.wait()
            return -9
        time.sleep(0.005)
    p.send_signal(signal.SIGKILL)
    p.wait()
    return -9


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    corpus = synth.ensure_corpus(3000)
    docs = synth.docs_path(corpus)

    # uninterrupted reference run
    full = str(tmp_path / "full")
    rc, out = _run(docs, full)
    assert rc == 0 and "DONE" in out
    done_parts = sorted(os.listdir(f"{full}/manifest"))
    assert done_parts

    # killed run: watch the manifest dir and SIGKILL after the first
    # partition lands (retry if the whole job beat the watcher)
    partial = str(tmp_path / "partial")
    got_partial = False
    for _ in range(4):
        shutil.rmtree(partial, ignore_errors=True)
        rc = _run_kill_when_partial(docs, partial, min_parts=1)
        n = len(os.listdir(f"{partial}/manifest")) if os.path.isdir(
            f"{partial}/manifest") else 0
        if rc == -9 and 0 < n < len(done_parts):
            got_partial = True
            break
    if not got_partial:
        pytest.skip("could not catch the run mid-flight on this machine")

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
