from __future__ import annotations

import pytest
import ray
from ray.data import DataContext


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (per project convention).

    8 CPUs, not 4: Ray's JoinOperator reserves ~2 CPUs of aggregator
    actors per join, and composed pipelines (prepare_corpus) stack three
    joins — at 4 CPUs the joins pin the whole cluster and the upstream
    map/sort tasks deadlock (observed as a silent test_contract hang)."""
    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory) -> str:
    """Small deterministic pages fixture shared across tests (t1 smoke scale)."""
    from searchengine_ray.synth import write_pages

    d = tmp_path_factory.mktemp("pages_t1")
    return write_pages(str(d), n_rows=1000, n_files=4, parallel=False)
