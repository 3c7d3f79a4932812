import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fx_dir():
    from d1_log_aggregation_ray.gen.fixtures import generate_fixtures
    return generate_fixtures("/root/testdata/sf0.001")
