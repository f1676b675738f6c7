"""Utils coverage: metrics, profiling timers, compile cache idempotence."""

import json

from nadavca_tpu.utils.cache import enable_compile_cache
from nadavca_tpu.utils.metrics import Metrics
from nadavca_tpu.utils.profiling import StageTimer, trace


def test_metrics_counters_and_jsonl(tmp_path):
    m = Metrics()
    m.count("reads", 3)
    m.count("reads", 2)
    m.gauge("rate", 1.234)
    snap = m.snapshot()
    assert snap["counters"]["reads"] == 5
    assert snap["gauges"]["rate"] == 1.234
    p = str(tmp_path / "m.jsonl")
    m.write_jsonl(p)
    m.write_jsonl(p)
    lines = open(p).read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["counters"]["reads"] == 5


def test_stage_timer_feeds_metrics():
    m = Metrics()
    st = StageTimer(m)
    with st.stage("ingest"):
        pass
    with st.stage("ingest"):
        pass
    assert "ingest" in st.totals
    assert "stage_ingest_s" in m.gauges


def test_trace_none_is_noop():
    with trace(None):
        x = 1 + 1
    assert x == 2


def test_enable_compile_cache_idempotent():
    enable_compile_cache()
    enable_compile_cache()  # second call must be a no-op
