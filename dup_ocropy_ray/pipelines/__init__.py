"""End-to-end pipeline compositions and the query registry."""
