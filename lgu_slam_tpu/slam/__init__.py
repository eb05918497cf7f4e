"""SLAM runtime: video state, motion filter, factor graph, frontend,
backend, trajectory filler, system orchestrator."""
