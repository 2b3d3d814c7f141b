from __future__ import annotations

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from vlm_ocr_pipeline_spark.plans.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _load_job(name: str):
    spec = importlib.util.spec_from_file_location(
        f"jobs_{name}", os.path.join(_REPO, "jobs", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def corpus_job(spark):
    """jobs/prepare_corpus.main bound to the shared session: e2e job
    tests run in-process instead of booting one JVM per subprocess
    (measured ~40 s saved per run on this box)."""
    mod = _load_job("prepare_corpus")

    def run(*argv: str) -> dict:
        return mod.main(list(argv), spark=spark)

    return run


@pytest.fixture(scope="session")
def frontier_job(spark):
    """jobs/build_frontier.main bound to the shared session."""
    mod = _load_job("build_frontier")

    def run(*argv: str) -> dict:
        return mod.main(list(argv), spark=spark)

    return run
