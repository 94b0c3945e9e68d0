from catme_etl_j_spark.plans.explain import formatted_plan, plan_has  # noqa: F401
