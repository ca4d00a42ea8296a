"""SparrowRecSys-TPU: a TPU-native movie recommender framework.

A from-scratch rebuild of the capabilities of SparrowRecSys (a Java/Spark/TF2
teaching-grade industrial recommender) as a single JAX/XLA/Pallas framework:

- feature plane  : vectorized MovieLens feature engineering
                   (replaces the Spark/Scala jobs under offline/spark/)
- training plane : Flax CTR model zoo + embedding pretraining
                   (replaces TFRecModel/ Keras scripts and MLlib Word2Vec)
- retrieval plane: on-TPU cosine/model scoring and brute-force top-k
                   (replaces Jetty + Redis + TF Serving scoring paths)
- serving facade : the reference's five HTTP endpoints + static webroot

Reference: qing-218/SparrowRecSys (cited per-module as file:line).
"""

__version__ = "0.1.0"
