"""Document sources: synthetic element streams and DOCX plumbing."""
