"""Extended operator surface: batch relational analytics (free
coverage from Spark SQL — SURVEY.md §2 note under P4) and the
LLM-data-pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) mandated by BASELINE.json."""
