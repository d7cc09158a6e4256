"""Banking domain layer: schemas, deterministic distributed seeding, and the
entity transforms (customer / account / transaction) of the reference
pipeline, re-expressed Spark-first.
"""
