-- database: spark; tables: nation; groups: url_functions;
SELECT u,
       parse_url(u, 'HOST') AS host,
       parse_url(u, 'PATH') AS path,
       parse_url(u, 'QUERY') AS query,
       parse_url(u, 'QUERY', 'q') AS q_param,
       parse_url(u, 'PROTOCOL') AS protocol
FROM VALUES ('http://example.com:8080/docs/a.html?q=spark&x=1'),
            ('https://user@sub.host.org/p/q'),
            ('ftp://files.net/pub') AS t(u)
ORDER BY u
