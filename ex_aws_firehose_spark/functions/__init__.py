"""Function library: codecs and vector/text primitives that the
built-in pyspark.sql.functions surface lacks."""
