"""Run the vendored sqllogictest scripts through the runner."""

import glob
import os

import pytest

HERE = os.path.dirname(__file__)
SCRIPTS = sorted(glob.glob(os.path.join(HERE, "sqllogic", "*.test")))


@pytest.mark.parametrize("path", SCRIPTS, ids=[os.path.basename(p)
                                               for p in SCRIPTS])
def test_sqllogic_file(path):
    from duckdb_tpu.testing.sqllogic import SqlLogicRunner

    res = SqlLogicRunner().run_file(path)
    assert res.ok, "\n".join(res.errors)
    assert res.passed > 0
