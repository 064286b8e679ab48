"""Scalar/array/date/JSON function surface (SURVEY.md §2.3 'Scalar fns').

The reference has no scalar functions at all — its whole expression language
is the comparison set in compareExp (reference: src/QueryProcessor1.java:
175-197). This package declares + oracle-tests the built-in pyspark.sql
function surface the rebuilt engine leans on.
"""
