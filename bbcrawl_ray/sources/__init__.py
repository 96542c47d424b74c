"""Source operators: pager expansion (seed → frontier) and the synthetic corpus."""
