from __future__ import annotations

import pytest

from logpipe.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="logpipe-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from logpipe.synth import synth_transcripts

    return synth_transcripts(spark, n_rows=4000, n_convs=32).cache()


@pytest.fixture(scope="session")
def k8s_meta(spark):
    from logpipe.synth import synth_k8s_meta

    return synth_k8s_meta(spark, n_convs=32).cache()


@pytest.fixture(scope="session")
def tool_meta(spark):
    from logpipe.synth import synth_tool_meta

    return synth_tool_meta(spark, n_tools=16).cache()
