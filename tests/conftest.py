import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webextract import pipeline  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N_GOLDEN = 500  # must match scripts/make_goldens.py


@pytest.fixture(scope="session")
def spark():
    s = pipeline.build_session(cpus=8, shuffle_partitions=8, app="webextract-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    from webextract import fixtures

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    fixtures.write_pages_parquet(path, N_GOLDEN)
    return path
