"""Sources: connector-analog readers (SURVEY §2.1).

Batch tables load via engine.read_parquet / engine.load_table; streaming
sources live in varpulis_spark.streaming (timer/file/kafka). This package
holds replay/test sources (the `.evt` event-file format) and the broker
connector bridges (MQTT/NATS/Kinesis) built on the shared spool
(sources/spool.py).
"""

from varpulis_spark.sources.event_file import load_evt  # noqa: F401
from varpulis_spark.sources.kinesis import (  # noqa: F401
    KinesisConfig,
    KinesisSink,
    KinesisSource,
)
from varpulis_spark.sources.mqtt import (  # noqa: F401
    MqttConfig,
    MqttSink,
    MqttSource,
)
from varpulis_spark.sources.nats import (  # noqa: F401
    NatsConfig,
    NatsSink,
    NatsSource,
)
