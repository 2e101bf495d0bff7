"""Profile token_freq_top100 at sf0.1: where do the 7s go?"""
import time

from stock_price_prediction_using_stream_and_batch_processing_spark import get_spark, plans
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="prof")

d = load_table(spark, SF, "documents")
d.count()

def timeit(label, df):
    # warmup + min of 2, mirroring bench
    df.write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None or el < best else best
    print(f"{label}: {best:.2f}s")
    return best

print("docs rows:", d.count())
print("avg text len:", d.select(F.avg(F.length("text"))).first()[0])

q = plans.get("token_freq_top100")
timeit("full query", q.fn(spark, SF))

from stock_price_prediction_using_stream_and_batch_processing_spark.functions import text as tx

# stage 1: just normalize
timeit("normalize only", d.select(tx.normalize("text").alias("n")))
# stage 2: tokens
timeit("tokens only", d.select(tx.tokens("text").alias("t")))
# stage 3: explode
timeit("explode", d.select(F.explode(tx.tokens("text")).alias("token")))
# stage 4: explode+groupBy
timeit("explode+groupBy", d.select(F.explode(tx.tokens("text")).alias("token")).groupBy("token").agg(F.count("*").alias("cnt")))
# full with orderBy/limit
timeit("plus topk", d.select(F.explode(tx.tokens("text")).alias("token")).groupBy("token").agg(F.count("*").alias("cnt")).orderBy(F.col("cnt").desc(), F.col("token")).limit(100))

q.fn(spark, SF).explain("formatted")
spark.stop()
