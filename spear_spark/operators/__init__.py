"""Custom operators beyond the reference's surface (SURVEY §7 phase 5):
as-of join, dedup family, similarity search, text analysis, multimodal
column plumbing — each composed from DataFrame ops where semantics
allow, dropping to Arrow-batched pandas UDFs only where they don't.
"""
