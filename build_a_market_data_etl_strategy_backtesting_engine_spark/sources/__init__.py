"""Sources & sinks: feed normalization, seeded tick generation, batch IO."""
