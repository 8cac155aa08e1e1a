-- Reference: CDK/cdk/athena_queries/fixed_dates_violent.txt:1-9
-- Dialect translation (SURVEY.md §2.3 F4-F6):
--   date_parse("date", '%m/%d/%Y %T %p') -> to_timestamp(`date`, 'MM/dd/yyyy hh:mm:ss a')
--   date_format(ts, '%W')                -> date_format(ts, 'EEEE')  (weekday name)
--   DAY_OF_WEEK(ts)  [ISO Mon=1..Sun=7]  -> weekday(ts) + 1
--     (Spark's dayofweek() is Sun=1..Sat=7 — the verbatim port would
--      be silently off by one.)
CREATE OR REPLACE TEMP VIEW fixed_dates_violent AS
SELECT
    date_format(date_timestamp, 'EEEE') AS day_of_week,
    weekday(date_timestamp) + 1 AS day_of_week_num,
    *
FROM (SELECT
    to_timestamp(`date`, 'MM/dd/yyyy hh:mm:ss a') AS date_timestamp,
    *
FROM dependency1_violent_crimes)
