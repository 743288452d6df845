"""virapipe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NGSeq/ViraPipe.

The reference (ViraPipe, ``org.ngseq.metagenomics``) is ~19 independent
Spark driver programs chained through HDFS by a bash orchestrator
(reference ``scripts/virapipe.sh:38-63``). This package re-expresses every
operator as composable DataFrame -> DataFrame functions running in a
single SparkSession, letting Catalyst/AQE plan the physical execution.

Layout
------
- :mod:`virapipe_spark.session`   — tuned SparkSession builder
- :mod:`virapipe_spark.schemas`   — the four reference record schemas
- :mod:`virapipe_spark.io`        — FASTQ/FASTA/SAM/BLAST/parquet readers & writers
- :mod:`virapipe_spark.functions` — sequence/quality/name scalar functions (Column builders)
- :mod:`virapipe_spark.orf`       — six-frame ORF translation (the one pandas UDF)
- :mod:`virapipe_spark.pipeline`  — Pipeline runner + ExternalTool plug-point
- :mod:`virapipe_spark.tools`     — named tool stages (blastn/hmmsearch/
  bwa_align/megahit_assemble factories over ExternalTool)
- :mod:`virapipe_spark.scale`     — salted join, bucketed write, two-phase top-k
- :mod:`virapipe_spark.graph`     — connected components (min-label propagation,
  lineage-checkpointed)
- :mod:`virapipe_spark.streaming` — Structured Streaming over event tables
- :mod:`virapipe_spark.multimodal` — binary media columns (decode/resize/
  frame-sample/audio; real BMP/WAV codecs, compressed formats stubbed)
- :mod:`virapipe_spark.catalog`   — named-query registry (driver correctness contract)
- :mod:`virapipe_spark.queries`   — catalog entries: relational, genomics,
  dataflow, streaming, and the training-data extensions (dedup/ANN/text)
"""

from virapipe_spark.session import session
from virapipe_spark import schemas

__version__ = "0.3.0"

__all__ = ["session", "schemas", "__version__"]
