"""Plans: the JSON graph-config → DataFrame plan layer (SURVEY §2.a E5/E10, §3.1)."""
