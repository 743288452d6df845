"""Query-catalog modules; importing them registers named queries."""
