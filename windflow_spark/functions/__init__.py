"""Scalar/table function layer. The reference has NO function library (all
compute is user C++ closures, SURVEY.md §2.11); this package provides the
built-in surface a relational engine needs plus the LLM-data-pipeline
operators (dedup, similarity, text analysis, multimodal) designed for 100 TB.
"""
