"""S6: the reference's XML pipeline-config document, parsed natively.

The reference downloads one XML file and reads six scalars out of it
(`/root/reference/data_pipeline.py:170-211`): ``supabase/bucketName``,
``supabase/tableName``, and ``mail/{sender,to,subject,message_text}`` —
then prints every one of them. This module keeps the same document
shape but:

- fetches through the Hadoop FS API, so the config can live next to the
  data on any supported store (``file://``, ``hdfs://``, ``s3a://``) —
  the analog of the reference's object-store bucket;
- validates strictly: a missing or empty element raises with the
  element path named, instead of the reference's catch-all
  ``return None`` that surfaces later as an unrelated crash;
- never logs values — config may carry addresses and routing data, and
  the reference's print-everything startup is the anti-pattern SURVEY.md
  explicitly bans.

Config is driver-side metadata (one small document), so this is plain
ElementTree, not a Spark read: there is no data-plane XML in the
reference, and pulling an executor fleet into a 6-field parse would be
scale theater.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass

from pyspark.sql import SparkSession

_FIELDS = {
    "bucket_name": "./supabase/bucketName",
    "table_name": "./supabase/tableName",
    "sender": "./mail/sender",
    "to": "./mail/to",
    "subject": "./mail/subject",
    "message_text": "./mail/message_text",
}


@dataclass(frozen=True)
class ReferenceXmlConfig:
    """The six scalars the reference extracts (data_pipeline.py:183-188)."""

    bucket_name: str
    table_name: str
    sender: str
    to: str
    subject: str
    message_text: str


def parse_reference_config(xml_str: str) -> ReferenceXmlConfig:
    """Strict parse of the reference's config document shape."""
    try:
        root = ET.fromstring(xml_str)
    except ET.ParseError as e:
        raise ValueError(f"pipeline config is not well-formed XML: {e}") from e
    values: dict[str, str] = {}
    for attr, path in _FIELDS.items():
        node = root.find(path)
        if node is None or node.text is None or not node.text.strip():
            raise ValueError(
                f"pipeline config missing required element {path!r}"
            )
        values[attr] = node.text.strip()
    return ReferenceXmlConfig(**values)


def load_reference_config(spark: SparkSession, path: str) -> ReferenceXmlConfig:
    """Read + parse the config document from any Hadoop-FS URI."""
    from ..sinks.upsert import _hadoop_fs

    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(f"pipeline config not found: {path}")
    stream = fs.open(p)
    try:
        xml_str = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return parse_reference_config(xml_str)


def to_pipeline_config(cfg: ReferenceXmlConfig, base_dir: str, **overrides):
    """O2 config-driven dispatch: map the reference's (bucket, table)
    pair onto the engine's path layout — landing files under the bucket
    prefix, target/ledger/quarantine keyed by the table name — the same
    role the pair plays in the reference (`data_pipeline.py:147,541`).
    Extra keyword arguments pass through to ``PipelineConfig`` (e.g. the
    notification callables that replace the mail fields' side channel).
    """
    from ..plans.reference_etl import PipelineConfig

    base = base_dir.rstrip("/")
    defaults = dict(
        landing_dir=f"{base}/{cfg.bucket_name}/Data",
        target_path=f"{base}/{cfg.table_name}",
        ledger_path=f"{base}/{cfg.table_name}_log",
        quarantine_path=f"{base}/{cfg.table_name}_quarantine",
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)
