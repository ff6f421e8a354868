"""Multi-format source readers — the Spark-native analogue of Yuki's
file staging (/root/reference/Yuki/server/routes/upload.py: files are
staged into a workflow's storage and become job inputs).

Here a "staged input" is any path readable by a Spark DataSource;
format is inferred from the extension or given explicitly. Explicit
schemas are supported (and recommended at scale — schema inference
costs a full extra pass on CSV/JSON) plus column projection so only
the needed columns reach the scan (``ReadSchema`` pruning)."""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
    ".txt": "text",
}


def _infer_ext(path: str) -> str | None:
    """Extension that drives format inference: the path's own, or the
    first data file's when ``path`` is a dataset directory (possibly
    hive-partitioned)."""
    base = path.rstrip("/")
    _, ext = os.path.splitext(base)
    if ext and ext.lower() in _EXT_FORMAT:
        return ext.lower()
    if os.path.isdir(base):
        for _root, _dirs, files in sorted(os.walk(base)):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue  # _SUCCESS, checksums, hidden
                fext = os.path.splitext(f)[1].lower()
                if fext in _EXT_FORMAT:
                    return fext
    return None


def infer_format(path: str) -> str:
    ext = _infer_ext(path)
    if ext is None:
        raise ValueError(f"cannot infer format from {path!r}; pass format=")
    return _EXT_FORMAT[ext]


def read_source(
    spark: SparkSession,
    path: str,
    format: str | None = None,
    schema: StructType | str | None = None,
    columns: list[str] | None = None,
    merge_schema: bool = False,
    **options: str,
) -> DataFrame:
    """Read one staged input.

    - ``schema``: StructType or DDL string; skips inference.
    - ``columns``: projection applied immediately so Catalyst prunes
      the scan to just those columns.
    - ``merge_schema``: schema-evolution read for parquet/orc — union
      the schemas of every part file (columns added over a dataset's
      lifetime surface as nulls in older files) instead of trusting
      the first footer. Costs a footer read per file; leave off for
      schema-stable datasets.
    - ``options``: passed through (e.g. ``header='true'`` for csv,
      ``sep='\\t'`` for tsv).
    """
    fmt = format or infer_format(path)
    reader = spark.read.format(fmt)
    if merge_schema:
        options.setdefault("mergeSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
        # a directory of .tsv part files infers 'csv' too — decide the
        # separator from the same extension inference, not just the
        # top-level path string
        if _infer_ext(path) == ".tsv":
            options.setdefault("sep", "\t")
    df = reader.options(**options).load(path)
    if columns:
        df = df.select(*columns)
    return df


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest raw media/blob files as rows via Spark's ``binaryFile``
    source — the staging step for multimodal (image/audio/video)
    corpora before the mapInPandas decode operators
    (operators/multimodal.py) take over.

    Columns: ``path``, ``modificationTime``, ``length``, ``content``
    (binary). ``glob`` filters filenames (e.g. ``*.jpg``);
    ``max_bytes`` drops oversized blobs *at the scan* via the
    length column so the filter prunes before content is shipped."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(df["length"] <= max_bytes)
    return df


def read_many(
    spark: SparkSession,
    paths: dict[str, str],
    register: bool = False,
    **kwargs,
) -> dict[str, DataFrame]:
    """Stage several named inputs at once; optionally register each as
    a temp view (the catalog pattern for ad-hoc sources)."""
    out = {}
    for name, path in paths.items():
        df = read_source(spark, path, **kwargs)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
