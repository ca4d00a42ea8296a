"""Online serving plane: catalog store, recall+rank pipelines, HTTP facade.

TPU-native rebuild of `online/` (Java 8 + Jetty + Redis + TF Serving):
the in-JVM feature store becomes a columnar catalog with device-resident
embedding matrices; the per-candidate cosine loop becomes one jitted
matmul; the TF-Serving REST hop becomes an in-process jitted scorer.
"""

from sparrowrecsys_tpu.serving.catalog import DataManager, Movie, Rating, User
from sparrowrecsys_tpu.serving.ab import get_config_by_user_id
