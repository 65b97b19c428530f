"""Structured Streaming surface (SURVEY §2.9).

The reference is a batch granule processor; its only incremental structures
are multi-tile accumulation (products.py:1849 __add__) and time-gap
sessionization (raster_proc.py:744-753). The streaming façade maps those to
Structured Streaming: file-source micro-batches ≡ arriving tiles, watermarked
session windows ≡ gap grouping, and late rows beyond the watermark are
dropped exactly as the reference drops out-of-bounds points
(products.py:1148-1151 idx_mask).
"""
