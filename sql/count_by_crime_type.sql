-- Reference: CDK/cdk/athena_queries/count_by_crime_type.txt:1-7
-- Presto's quoted alias "count" becomes backticked `count` in Spark.
CREATE OR REPLACE TEMP VIEW count_by_crime_type AS
SELECT
    primary_type || ' - ' || description AS crime_type,
    COUNT(*) AS `count`
FROM processed
GROUP BY primary_type || ' - ' || description
