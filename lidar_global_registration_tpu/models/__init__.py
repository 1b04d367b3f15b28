"""Pipeline assemblies: matchers, pose solvers, end-to-end registration."""
