"""transformWithStateInPandas dependency probe (round-14, VERDICT r13
stretch item 8): Spark 4's native keyed-state+timer API (SURVEY §2
P1/P2's preferred surface) requires protobuf for its driver<->Python
state-server protocol.  This container has no protobuf wheel and no
network (`pip download protobuf` -> DNS failure), so TWS genuinely
cannot load — this probe PINS the exact failure mode so the boundary
is documented fail-loud, not assumed.  The moment a protobuf wheel
appears in the image, test_tws_protobuf_absent fails and flags that a
native TWS twin should be registered next to the
applyInPandasWithState keys (streaming/queries.py:866,931), which
deliver the same P1/P2 semantics driver-green today.
"""

from __future__ import annotations

import importlib.util
import time

import pandas as pd
import pytest
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _protobuf_available() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        # no `google` namespace package at all
        return False


def test_tws_protobuf_absent():
    """The dependency is genuinely absent (not merely unimported)."""
    assert not _protobuf_available(), (
        "protobuf is now installed — register a native "
        "transformWithStateInPandas twin for a timer key and retire "
        "this probe"
    )


@pytest.mark.skipif(
    _protobuf_available(), reason="protobuf present: TWS should work"
)
def test_tws_fails_loud_with_protobuf_import_error(spark):
    """A real TWS query (not an import check): the streaming runner
    must crash with the protobuf ImportError — pinning that the
    boundary is the dependency, not a silent wrong answer."""

    # defined in function scope so cloudpickle serializes the class BY
    # VALUE — the TWS driver worker is a fresh subprocess that cannot
    # import the tests package
    class _CountProc(StatefulProcessor):
        def init(self, handle):
            self.count = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(p) for p in rows)
            prev = self.count.get()
            total = (prev[0] if prev else 0) + n
            self.count.update((total,))
            yield pd.DataFrame({"user": [key[0]], "n": [total]})

        def close(self):
            pass

    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .selectExpr("CAST(value % 5 AS STRING) AS user", "value")
    )
    out_schema = StructType(
        [StructField("user", StringType()), StructField("n", LongType())]
    )
    q = (
        df.groupBy("user")
        .transformWithStateInPandas(_CountProc(), out_schema, "Update", "None")
        .writeStream.format("memory")
        .queryName("tws_probe")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        exc = None
        deadline = time.time() + 90
        while time.time() < deadline:
            exc = q.exception()
            if exc is not None:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert exc is not None, (
        "TWS ran without protobuf — the probe's premise is stale; "
        "register a native TWS key"
    )
    # The protobuf ImportError sits in the JVM cause chain, not the
    # top-level message ("driver worker exited unexpectedly"): walk
    # the captured chain + stack-trace text for the real cause.
    texts = []
    e = exc
    seen = 0
    while e is not None and seen < 10:
        texts.append(str(e))
        texts.append(str(getattr(e, "_stackTrace", "") or ""))
        e = getattr(e, "_cause", None)
        seen += 1
    blob = "\n".join(texts).lower()
    assert "protobuf" in blob or "google" in blob, (
        f"TWS failed for an unexpected reason:\n{blob[:2000]}"
    )
