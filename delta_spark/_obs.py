"""Non-blocking Observation readout.

``Observation.get`` blocks on a QueryExecutionListener notification
that never arrives for actions executed INSIDE ``foreachBatch`` (the
listener bus treats them as streaming-internal), deadlocking the
micro-batch. The JVM-side ``getRowOrEmpty`` returns the already-set
metrics row without waiting — correct in both batch and foreachBatch
contexts since we only read AFTER the action completed.

Returns None when the observed subtree was optimized away entirely
(e.g. a statically-empty filter → PropagateEmptyRelation drops the
CollectMetrics node, so no metrics ever materialize).
"""

from __future__ import annotations

import time

from pyspark.sql import Observation


def observe_get(obs: Observation, timeout_s: float = 2.0) -> dict | None:
    jo = getattr(obs, "_jo", None)
    if jo is None:
        return None
    deadline = time.time() + timeout_s
    while True:
        try:
            opt = jo.getRowOrEmpty()
            if opt.isDefined():
                from pyspark.serializers import CPickleSerializer

                utils = getattr(
                    obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
                )
                row = CPickleSerializer().loads(utils.toPyRow(opt.get()))
                return row.asDict(recursive=False)
        except Exception:
            return None
        if time.time() >= deadline:
            return None
        time.sleep(0.05)
