import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (see repo instructions)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus(tmp_path_factory):
    """Small deterministic interleaved-doc corpus shared by pipeline tests."""
    from dup_ocropy_ray.sources.fixtures import build_corpus

    root = tmp_path_factory.mktemp("corpus")
    return build_corpus(str(root), num_docs=6, seed=42)
