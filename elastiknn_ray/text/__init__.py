"""Text operators: HTML extraction (N1), k-shingling (N2), and the
text-analysis function library (language ID, quality scoring, token counts,
fingerprinting) — SURVEY.md §2.5."""
