"""Control plane: query registry, run-log model, scheduler, orchestrator."""
