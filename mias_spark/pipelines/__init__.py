"""Pipelines: the oracle-checked query suite (suite.py) — IR core over
the driver's `documents` table, training-data ops (dedup / similarity /
text analysis) and relational coverage — plus engine-native extras."""
