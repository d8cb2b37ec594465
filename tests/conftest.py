import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from cvocr_spark.session import build_session, ensure_shipped

    s = build_session(app="cvocr-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    ensure_shipped(s)
    yield s
    s.stop()
