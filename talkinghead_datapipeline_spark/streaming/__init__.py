"""Streaming & incremental execution (SURVEY §2.a E7/E11, §2.d streaming)."""
