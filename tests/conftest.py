"""Session-scoped Ray + shared fixtures.

Ray is initialised ONCE per pytest session (the driver contract requires the
library itself to never call ray.init/shutdown).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
# workers spawned by the head node inherit this env → package importable
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)


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

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """120-base-record fixture corpus on disk → (corpus_dir, golden_path)."""
    from entity_deduplication_hack_main_ray.fixtures import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    return write_corpus(out, 120, seed=42, rows_per_file=64)


@pytest.fixture(scope="session")
def tiny_corpus_table(tiny_corpus):
    import pyarrow.dataset as pads

    return pads.dataset(tiny_corpus[0]).to_table()
