"""Spark 4 ``transformWithStateInPandas`` operators (the successor API
to ``applyInPandasWithState`` used in streaming/stateful.py).

The new API adds named state variables (value/list/map), TTL, and
first-class processing-/event-time timers — at 100 TB the practical
wins are per-variable TTL (bounded state without watermark gymnastics)
and schema-evolvable state.

GATED: the runtime path needs the ``google.protobuf`` Python package
for state-server messaging, which this container lacks — import and
construction work, execution raises in the Python worker.  The
companion test skips when protobuf is unavailable; operators here keep
the applyInPandasWithState twins in streaming/stateful.py as the
always-runnable path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def protobuf_available() -> bool:
    try:  # runtime dependency of the transformWithState state server
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def subsystem_running_counts_v2(events: DataFrame) -> DataFrame:
    """Running event count per subsystem as a TransformWithState
    processor with a single value-state variable.

    Equivalent dataflow to the reference's ``/stats`` counter
    (stats.py:28-50 + dispatcher.py:56) but keyed, distributed, and
    checkpoint-recoverable.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count = handle.getValueState("count", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self.count.get()[0] if self.count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.count.update((n,))
            yield pd.DataFrame({"subsystem": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    return events.groupBy("subsystem").transformWithStateInPandas(
        RunningCount(),
        outputStructType="subsystem string, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )
