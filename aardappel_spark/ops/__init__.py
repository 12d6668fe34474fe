"""Large-scale data-pipeline operators (beyond the reference's surface):
deduplication, similarity search, text analysis, multimodal plumbing.
All shuffle-conscious and expressed with built-in JVM functions wherever
possible (BASELINE.json north star)."""
