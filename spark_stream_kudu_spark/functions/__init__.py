from spark_stream_kudu_spark.functions.hashing import md5_int32, minhash_params  # noqa: F401
from spark_stream_kudu_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from spark_stream_kudu_spark.functions.timeutil import epoch_millis  # noqa: F401
from spark_stream_kudu_spark.functions.textutil import tokens, normalized_text  # noqa: F401
