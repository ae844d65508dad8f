"""ML layer: pyspark.ml pipelines re-expressing XGBoost/Predictor.py."""
