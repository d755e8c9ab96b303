import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never per test)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """t1 smoke corpus: 100 labeled docs (FIXTURES.md §1)."""
    from raysearch.corpus import generate_corpus

    return generate_corpus(100, seed=42, labeled=True)


@pytest.fixture(scope="session")
def medium_corpus():
    """t2 correctness corpus: ~2000 docs."""
    from raysearch.corpus import generate_corpus

    return generate_corpus(2000, seed=42, labeled=True)
