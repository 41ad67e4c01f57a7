import os

import pytest
import ray

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def built_index(tmp_path_factory, ray_session):
    """Index over the sf0.001 documents table, built once per session."""
    import ray.data

    from harvester_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("index"))
    docs = ray.data.read_parquet(
        os.path.join(SF_SMOKE, "documents.parquet"), columns=["doc_id", "text"]
    )
    return build_index(docs, out)
