"""Multimodal columns (SURVEY.md §2.I I5): image/audio/video as opaque
binary columns with typed metadata, processed by Arrow-batched Pandas
UDFs over mapInPandas."""
