import sys
from pathlib import Path

# make the repo root importable regardless of pytest invocation cwd
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small():
    return os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")
