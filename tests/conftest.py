"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

# transformWithStateInPandas needs google.protobuf in BOTH the driver
# and the Python workers (the state-server protocol is protobuf). The
# package isn't pip-installed here, but a standalone copy rooted at
# plain `google.protobuf` ships inside the container's google-cloud-sdk
# platform dir. Probe for it BEFORE the JVM starts so workers inherit
# the path via PYTHONPATH; if neither source exists the dependent test
# still importorskips.
_PROTOBUF_FALLBACKS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _ensure_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    for cand in _PROTOBUF_FALLBACKS:
        if os.path.isfile(
            os.path.join(cand, "google", "protobuf", "__init__.py")
        ):
            sys.path.insert(0, cand)
            os.environ["PYTHONPATH"] = (
                cand + os.pathsep + os.environ.get("PYTHONPATH", "")
            )
            # the fallback runtime may trail pyspark's gencode by one
            # minor version; the strict check would refuse to load.
            # Safe here: the stateful-streaming test asserts exact
            # values, so any real protocol break still fails loudly.
            os.environ.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
            return


_ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    from sales_data_pipeline_spark.session import build_session

    s = build_session("pytest")
    yield s
