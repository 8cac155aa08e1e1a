-- Reference: CDK/cdk/athena_queries/dependency1_violent_crimes.txt:1-10
-- (verbatim semantics; TEMP VIEW instead of Athena view; table
-- "processed" = glue_crime_db.processed)
CREATE OR REPLACE TEMP VIEW dependency1_violent_crimes AS
SELECT
    *
FROM processed
WHERE
     (primary_type = 'ROBBERY' AND description LIKE '%ARMED%') OR
      primary_type = 'ASSAULT' OR
      primary_type = 'BATTERY' OR
      primary_type = 'HOMICIDE' OR
      primary_type = 'CRIMINAL SEXUAL ASSAULT'
