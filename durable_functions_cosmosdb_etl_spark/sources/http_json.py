"""HTTP JSON extract source (reference operator O5).

The reference's ``ExtractAsync`` (/root/reference/EtlProcess.cs:133-161)
GETs a JSON array from ``ExternalEndpoint`` and deserializes it. Here:

- ``extract_json(url)`` — driver-side fetch of ONE endpoint returning a
  modest payload (the reference's shape: 10-200 docs). Returns ``None``
  on HTTP/parse failure, mirroring EtlProcess.cs:153,159.
- ``extract_json_to_df`` — wraps the payload into a DataFrame with the
  explicit SampleItem schema (schema-on-read, EtlProcess.cs:199).
- For *many* endpoints / large payloads the scale path is
  ``fetch_many_to_df``: parallelize the URL list and fetch inside
  ``mapInPandas`` so the I/O fans out across executors instead of
  serializing through the driver.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator
from urllib.error import URLError
from urllib.request import Request, urlopen

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import SAMPLE_ITEM_SCHEMA

_FIELD_RENAMES = {  # JsonProperty renames, SampleItem.cs:9; C# casing → snake
    "id": "id",
    "Date": "date",
    "Desc": "desc",
    "Done": "done",
    "Name": "name",
    "Pr": "pr",
    "LogicalPartition": "logical_partition",
}


def _normalize(doc: dict) -> dict:
    out = {}
    for src, dst in _FIELD_RENAMES.items():
        if src in doc:
            out[dst] = doc[src]
        elif dst in doc:
            out[dst] = doc[dst]
        else:
            out[dst] = None
    return out


def extract_json(url: str, timeout: float = 30.0) -> list[dict] | None:
    """GET a JSON array of documents; None on failure (EtlProcess.cs:153,159)."""
    try:
        req = Request(url, headers={"Accept": "application/json"})  # :141
        with urlopen(req, timeout=timeout) as resp:
            # IsSuccessStatusCode check (:144); non-HTTP schemes
            # (file:// in tests) report status None → success
            status = getattr(resp, "status", None)
            if status is not None and status != 200:
                return None
            payload = json.loads(resp.read().decode("utf-8"))
    except (URLError, OSError, ValueError):
        return None
    if not isinstance(payload, list):
        return None
    return [_normalize(d) for d in payload]


def extract_json_to_df(spark: SparkSession, url: str) -> DataFrame | None:
    docs = extract_json(url)
    if docs is None:
        return None
    return spark.createDataFrame(docs, schema=SAMPLE_ITEM_SCHEMA)


def fetch_many_to_df(spark: SparkSession, urls: Iterable[str]) -> DataFrame:
    """Distributed fetch: one task per URL batch, I/O on executors.

    100 TB posture: the driver never sees the payloads — each executor
    task fetches its URLs and emits Arrow batches.
    """
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(32)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u in pdf["url"]:
                docs = extract_json(u) or []
                rows.extend(docs)
            yield pd.DataFrame(rows, columns=list(_FIELD_RENAMES.values()))

    return urls_df.mapInPandas(fetch, schema=SAMPLE_ITEM_SCHEMA)
