"""Operator modules. Importing a module registers its queries
(see ex_aws_firehose_spark.registry.load_all_operators)."""
