/* SparrowRecSys-TPU frontend client.
 *
 * Original implementation (not copied from the reference): plain fetch()
 * against the same five-endpoint JSON API the reference exposes
 * (/getrecommendation, /getsimilarmovie, /getuser, /getmovie,
 * /getrecforyou), including the {"rating": {...}} wrapper on rating lists.
 */

async function getJSON(url) {
  const resp = await fetch(url);
  const text = await resp.text();
  if (!text) return null;
  return JSON.parse(text);
}

function movieCard(movie) {
  const div = document.createElement("div");
  div.className = "movie-card";
  const year = movie.releaseYear ? ` (${movie.releaseYear})` : "";
  div.innerHTML = `
    <a href="movie.html?movieId=${movie.movieId}">
      <div class="movie-title">${movie.title}${year}</div>
    </a>
    <div class="movie-meta">
      <span class="rating">★ ${movie.averageRating.toFixed(2)}</span>
      <span class="genres">${movie.genres.join(", ")}</span>
    </div>`;
  return div;
}

async function addGenreRow(containerId, genre, size) {
  const movies = await getJSON(
    `/getrecommendation?genre=${encodeURIComponent(genre)}&size=${size}&sortby=rating`);
  const container = document.getElementById(containerId);
  const row = document.createElement("section");
  row.className = "genre-row";
  row.innerHTML = `<h2><a href="collection.html?genre=${encodeURIComponent(genre)}">${genre}</a></h2>`;
  const strip = document.createElement("div");
  strip.className = "movie-strip";
  (movies || []).forEach(m => strip.appendChild(movieCard(m)));
  row.appendChild(strip);
  container.appendChild(row);
}

async function renderMoviePage(containerId, relatedId, movieId) {
  const movie = await getJSON(`/getmovie?id=${movieId}`);
  const container = document.getElementById(containerId);
  if (!movie) { container.textContent = "Movie not found."; return; }
  const ratings = (movie.topRatings || [])
    .map(r => `<li>user ${r.rating.userId}: ${r.rating.score}</li>`).join("");
  container.innerHTML = `
    <h1>${movie.title} (${movie.releaseYear})</h1>
    <p>${movie.genres.join(" | ")}</p>
    <p>★ ${movie.averageRating.toFixed(2)} from ${movie.ratingNumber} ratings</p>
    <p>IMDb: ${movie.imdbId} · TMDb: ${movie.tmdbId}</p>
    <h3>Top ratings</h3><ul>${ratings}</ul>`;
  const related = await getJSON(`/getsimilarmovie?movieId=${movieId}&size=16&model=emb`);
  const rel = document.getElementById(relatedId);
  rel.innerHTML = "<h2>You may also like</h2>";
  const strip = document.createElement("div");
  strip.className = "movie-strip";
  (related || []).forEach(m => strip.appendChild(movieCard(m)));
  rel.appendChild(strip);
}

async function renderUserPage(detailId, recId, historyId, userId) {
  const user = await getJSON(`/getuser?id=${userId}`);
  const detail = document.getElementById(detailId);
  if (!user) { detail.textContent = "User not found."; return; }
  detail.innerHTML = `
    <h1>User ${user.userId}</h1>
    <p>${user.ratingCount} ratings · avg ${user.averageRating.toFixed(2)}
       · high ${user.highestRating} · low ${user.lowestRating}</p>`;
  const recs = await getJSON(`/getrecforyou?id=${userId}&size=32&model=emb`);
  const recDiv = document.getElementById(recId);
  recDiv.innerHTML = "<h2>Recommended for you</h2>";
  const strip = document.createElement("div");
  strip.className = "movie-strip";
  (recs || []).forEach(m => strip.appendChild(movieCard(m)));
  recDiv.appendChild(strip);

  const hist = document.getElementById(historyId);
  hist.innerHTML = "<h2>Rating history</h2>";
  const list = document.createElement("ul");
  for (const wrapped of (user.ratings || []).slice(0, 50)) {
    const r = wrapped.rating;   // {"rating": {...}} wrapper shape
    const li = document.createElement("li");
    li.innerHTML = `<a href="movie.html?movieId=${r.movieId}">movie ${r.movieId}</a>: ${r.score}`;
    list.appendChild(li);
  }
  hist.appendChild(list);
}

async function renderCollection(containerId, genre, size) {
  const movies = await getJSON(
    `/getrecommendation?genre=${encodeURIComponent(genre)}&size=${size}&sortby=rating`);
  const container = document.getElementById(containerId);
  container.innerHTML = `<h1>${genre}</h1>`;
  const grid = document.createElement("div");
  grid.className = "movie-grid";
  (movies || []).forEach(m => grid.appendChild(movieCard(m)));
  container.appendChild(grid);
}

function qsParam(name) {
  return new URLSearchParams(window.location.search).get(name);
}
