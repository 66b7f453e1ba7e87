"""Medallion pipeline composition (SURVEY.md §3, Phase 4): layered
Bronze→Silver→Gold→ML jobs, a numbered-job runner, YAML config, and the
graceful optional-feature attachment pattern."""
