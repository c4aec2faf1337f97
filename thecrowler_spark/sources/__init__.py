"""Sources & sinks: synthetic corpus generators, lake tables, catalogs."""
