"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference streaming outbreak-detection system
(LiorItzhak/Big-Data-Analysis-Diseases-Outbreaks), re-expressed Spark-first.

Layout:
  session    - SparkSession factory (AQE, Arrow, UTC, local-mode sizing)
  sources    - table loaders for the driver's parquet testdata + sinks
  functions  - scalar/vector/text column-expression helpers (JVM-side first)
  operators  - reusable DataFrame->DataFrame operators (detrend, pivot,
               qfactor, dedup, similarity, asof, threshold, ...)
  plans      - composed end-to-end pipelines (trends anomaly flagship)
  streaming  - structured-streaming twins of the batch pipeline
  ml         - anomaly-detection ML tracks (KMeans distance, IsolationForest)
"""

__version__ = "0.1.0"
