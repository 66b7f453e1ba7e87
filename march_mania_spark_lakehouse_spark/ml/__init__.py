"""MLlib surface (SURVEY.md §2.11 M1–M9): vector assembly, LR/GBT
pipelines, AUC + DataFrame logloss, holdout/backtest splits, HPO, blend."""
