from dbt_core_gcloud_template_spark.operators import sampling


def model(dbt, session):
    """Token-budget epoch plan for the curated corpus: per-source
    sqrt-tempered mixture weights, budget*weight token allocations
    capped at max_epochs passes (vars: train_budget_tokens,
    max_epochs).  Runs on the DESPANNED text — the plan must count the
    tokens a trainer will actually see, not pre-removal ones.  One
    tiny per-source aggregate + a broadcast scalar; the only corpus
    pass is the token count."""
    dbt.config(materialized="table")
    docs = dbt.ref("docs_despanned")
    budget = int(dbt.config.get("train_budget_tokens", 100_000))
    max_epochs = int(dbt.config.get("max_epochs", 4))
    return sampling.token_budget_plan(
        docs, "source", "cleaned_text", budget=budget, max_epochs=max_epochs
    )
