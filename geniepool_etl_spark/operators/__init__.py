"""Relational + LLM-pipeline operators."""
