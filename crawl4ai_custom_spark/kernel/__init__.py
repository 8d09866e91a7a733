"""Pure-Python, Spark-free kernel primitives (unit-testable without a JVM)."""
