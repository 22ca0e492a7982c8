"""Engine operators (SURVEY §2 inventory, Spark-first)."""
