"""m5_competition_kaggle_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``aramian-wasielak/M5-Competition-Kaggle`` (a Luigi +
pandas + LightGBM forecasting pipeline), re-expressed Spark-first:

- the Luigi task grid becomes data parallelism over one lazy DataFrame plan
  (reference ``pipeline.py:310-335`` → ``plans/m5_pipeline.py``);
- eager pandas transforms become Catalyst-optimized DataFrame expressions
  (``operators/``, ``functions/``);
- pickle exchange becomes Parquet with explicit StructType contracts
  (``sources/``);
- per-(store, week) LightGBM training becomes grouped-map ``applyInPandas``
  (``ml/``);
- plus the large-scale training-data extensions the reference never had:
  dedup, similarity search, text analysis, multimodal plumbing, streaming
  (``operators/dedup.py``, ``operators/similarity.py``, ``functions/text.py``,
  ``multimodal/``, ``streaming/``).
"""

__version__ = "0.1.0"
