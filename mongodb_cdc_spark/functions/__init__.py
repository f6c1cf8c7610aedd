"""Reusable scalar/vector/text expression builders shared by operators.

These emit *expressions* (Spark Columns / SQL strings), never UDFs, so
everything stays inside Catalyst + whole-stage codegen.
"""
