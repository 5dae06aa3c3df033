"""Query plans: the named-query library and the reference ETL pipeline."""
