from .pages import generate_pages, make_gazetteer, pages_spark_df  # noqa: F401
