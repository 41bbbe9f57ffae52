"""Sources & sinks (SURVEY.md §2.1): harvesting, trend-store storage,
retention, JDBC."""
