"""Beyond-reference operators (SURVEY.md §7.2 M7).

The reference implements none of these (verified absences, SURVEY.md §2.2);
they are what a large-scale training-data pipeline needs on top of the
log-to-metrics core: relational analytics (joins, top-k, rollup, window
functions), deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, text analysis, and multimodal column
plumbing.
"""
