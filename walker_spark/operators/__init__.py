"""Composable DataFrame operators: link filters, URL-seen, politeness,
dedup, similarity, reports."""
