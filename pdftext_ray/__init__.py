"""pdftext_ray — a Ray-Data-native structured text-extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
VikParuchuri/pdftext (reference at /root/reference, studied for behavior only)
as a streaming Ray Data pipeline over Arrow tables of interleaved text+media
documents, plus the large-scale training-data operators (dedup, similarity
search, text analysis) such a corpus pipeline needs.
"""

__version__ = "0.1.0"
